"""proto <-> core conversion tests (reference grpc/conversions.rs has
18 in-file tests; this is the dedicated equivalent)."""

import json

import pytest

from cortex_tpu.graph.subgraph import Subgraph
from cortex_tpu.graph.types import Path
from cortex_tpu.server.conversions import (edge_to_pb, node_from_pb,
                                           node_to_pb, paths_to_pb,
                                           provenance_from_pb,
                                           subgraph_to_pb)
from cortex_tpu.types import Edge, EdgeProvenance, Node, Source


def make_node(**over):
    base = dict(
        id="00000000-0000-7000-8000-0000000000aa", kind="fact",
        title="conversion fixture", body="body", metadata={"a": 1},
        tags=["x", "y"],
        source=Source(agent="ag", session="se", channel="ch"),
        importance=0.75, access_count=4, last_accessed_at=30.0,
        created_at=10.0, updated_at=20.0, deleted=False)
    base.update(over)
    return Node(**base)


class TestNodeRoundtrip:
    def test_full_roundtrip(self):
        n = make_node()
        n2 = node_from_pb(node_to_pb(n))
        assert n2.id == n.id and n2.kind == n.kind
        assert n2.metadata == {"a": 1} and n2.tags == ["x", "y"]
        assert n2.source.agent == "ag" and n2.source.session == "se"
        assert n2.importance == pytest.approx(0.75)
        assert (n2.created_at, n2.updated_at,
                n2.last_accessed_at) == (10.0, 20.0, 30.0)
        assert n2.access_count == 4 and not n2.deleted

    def test_none_session_channel_roundtrip(self):
        n = make_node(source=Source(agent="solo"))
        n2 = node_from_pb(node_to_pb(n))
        assert n2.source.session is None
        assert n2.source.channel is None

    def test_empty_metadata_roundtrip(self):
        n = make_node(metadata={})
        p = node_to_pb(n)
        assert json.loads(p.metadata_json) == {}
        assert node_from_pb(p).metadata == {}

    def test_unicode_and_nested_metadata(self):
        n = make_node(title="ünïcødé ✓ title",
                      metadata={"nested": {"k": [1, "2", None]}})
        n2 = node_from_pb(node_to_pb(n))
        assert n2.title == "ünïcødé ✓ title"
        assert n2.metadata["nested"]["k"] == [1, "2", None]

    def test_deleted_flag(self):
        assert node_from_pb(node_to_pb(make_node(deleted=True))).deleted


class TestEdgeAndProvenance:
    def edge_with(self, prov):
        return Edge(id="e1", from_id="a", to_id="b",
                    relation="related_to", weight=0.5, provenance=prov,
                    created_at=1.0, updated_at=2.0)

    def test_manual_detail_is_creator(self):
        p = edge_to_pb(self.edge_with(EdgeProvenance.manual("alice")))
        assert p.provenance_kind == EdgeProvenance.MANUAL
        assert p.provenance_detail == "alice"
        back = provenance_from_pb(p.provenance_kind, p.provenance_detail,
                                  p.provenance_score)
        assert back.is_manual and back.created_by == "alice"

    def test_similarity_score_roundtrip(self):
        p = edge_to_pb(self.edge_with(
            EdgeProvenance.auto_similarity(0.87)))
        assert p.provenance_score == pytest.approx(0.87)
        back = provenance_from_pb(p.provenance_kind, p.provenance_detail,
                                  p.provenance_score)
        assert back.kind == EdgeProvenance.AUTO_SIMILARITY
        assert back.score == pytest.approx(0.87)

    def test_structural_rule_roundtrip(self):
        p = edge_to_pb(self.edge_with(
            EdgeProvenance.auto_structural("same_agent")))
        back = provenance_from_pb(p.provenance_kind, p.provenance_detail,
                                  p.provenance_score)
        assert back.rule == "same_agent"

    def test_contradiction_reason_roundtrip(self):
        p = edge_to_pb(self.edge_with(
            EdgeProvenance.auto_contradiction("negation detected")))
        back = provenance_from_pb(p.provenance_kind, p.provenance_detail,
                                  p.provenance_score)
        assert back.reason == "negation detected"

    def test_imported_source_roundtrip(self):
        p = edge_to_pb(self.edge_with(EdgeProvenance.imported("csv")))
        back = provenance_from_pb(p.provenance_kind, p.provenance_detail,
                                  p.provenance_score)
        assert back.source == "csv"

    def test_unknown_kind_defaults_to_manual(self):
        back = provenance_from_pb("mystery", "", 0.0)
        assert back.is_manual

    def test_edge_fields(self):
        p = edge_to_pb(self.edge_with(EdgeProvenance.manual("m")))
        assert (p.from_id, p.to_id, p.relation) == ("a", "b",
                                                    "related_to")
        assert p.weight == pytest.approx(0.5)
        assert (p.created_at, p.updated_at) == (1.0, 2.0)


class TestContainers:
    def test_subgraph_to_pb(self):
        n1, n2 = make_node(), make_node(
            id="00000000-0000-7000-8000-0000000000bb", title="second")
        e = Edge(id="e9", from_id=n1.id, to_id=n2.id,
                 relation="led_to", weight=0.9,
                 provenance=EdgeProvenance.manual("t"),
                 created_at=1.0, updated_at=1.0)
        sub = Subgraph(nodes={n1.id: n1, n2.id: n2}, edges=[e],
                       depths={n1.id: 0, n2.id: 1}, visited_count=2,
                       truncated=True)
        p = subgraph_to_pb(sub)
        assert len(p.nodes) == 2 and len(p.edges) == 1
        assert {d.node_id: d.depth for d in p.depths} == {n1.id: 0,
                                                          n2.id: 1}
        assert p.truncated and p.visited_count == 2

    def test_paths_to_pb(self):
        p = paths_to_pb([Path(nodes=["a", "b", "c"], edges=["e1", "e2"],
                              total_weight=0.72)])
        assert p.paths[0].length == 2
        assert list(p.paths[0].nodes) == ["a", "b", "c"]
        assert p.paths[0].total_weight == pytest.approx(0.72)

    def test_empty_paths(self):
        assert len(paths_to_pb([]).paths) == 0


class TestGrpcParsingEdgeCases:
    """Mirrors conversions.rs parse tests not covered by the roundtrip
    suite: enum-ish string parsing through the live gRPC service."""

    def test_invalid_kind_rejected(self, ):
        import grpc
        import pytest as _pytest
        from test_grpc import rig as _unused  # noqa: F401 (fixture file)
        from cortex_tpu.api import Cortex
        from cortex_tpu.server import cortex_pb2 as pb
        from cortex_tpu.server.grpc_service import (GrpcClient,
                                                    create_grpc_server)
        from cortex_tpu.server.state import ServerState
        cx = Cortex.in_memory()
        state = ServerState(cortex=cx)
        server = create_grpc_server(state, addr="127.0.0.1:0")
        port = server.add_insecure_port("127.0.0.1:0")
        server.start()
        client = GrpcClient(f"127.0.0.1:{port}")
        try:
            with _pytest.raises(grpc.RpcError):
                client.CreateNode(pb.CreateNodeRequest(
                    kind="Not A Valid Kind!",
                    title="Invalid kind should be rejected",
                    body="Body long enough for the checks here.",
                    skip_gate=True))
            # unknown direction falls back to BOTH; unknown strategy to
            # BFS (conversions.rs parse_direction/parse_strategy
            # defaults) — the traversal must succeed, not error
            nid = client.CreateNode(pb.CreateNodeRequest(
                kind="fact", title="Default direction works here",
                body="Body long enough for the checks too.",
                skip_gate=True)).node.id
            sub = client.Traverse(pb.TraverseRequest(
                start=[nid], max_depth=1, direction="sideways",
                strategy="quantum", include_start=True))
            assert len(sub.nodes) == 1
        finally:
            client.close()
            server.stop(0)
