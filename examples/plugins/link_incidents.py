"""linker_rule plugin: link events tagged `incident` to decisions that
mention rollback, whatever their similarity.

cortex.toml:
    [[plugins]]
    path = "examples/plugins/link_incidents.py"
    type = "linker_rule"
"""

from cortex_tpu.linker.rules import ProposedEdge
from cortex_tpu.types import EdgeProvenance


class IncidentRule:
    def evaluate(self, node, other, score):
        if (node.kind == "event" and "incident" in node.tags
                and other.kind == "decision"
                and "rollback" in other.body.lower()):
            return [ProposedEdge(node.id, other.id, "informed_by", 0.7,
                                 EdgeProvenance.auto_structural(
                                     "incident_rollback_plugin"))]
        return []


def make_rule():
    return IncidentRule()
