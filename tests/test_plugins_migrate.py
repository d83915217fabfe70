"""Plugin loading/attachment and prompt-migration tests."""

import json

import pytest

from cortex_tpu.api import Cortex
from cortex_tpu.config import PluginConfig
from cortex_tpu.plugins import PluginSet


RULE_PLUGIN = '''
from cortex_tpu.linker.rules import ProposedEdge
from cortex_tpu.types import EdgeProvenance

class AlwaysLinkEvents:
    def evaluate(self, node, other, score):
        if node.kind == "event" and other.kind == "event":
            return [ProposedEdge(node.id, other.id, "observed_with", 0.42,
                                 EdgeProvenance.auto_structural("plugin"))]
        return []

def make_rule():
    return AlwaysLinkEvents()
'''

EXPORT_PLUGIN = '''
def export(nodes, edges):
    return "\\n".join(n.title for n in nodes)
'''


class TestPlugins:
    def test_linker_rule_plugin_attaches_and_fires(self, tmp_path):
        p = tmp_path / "rule.py"
        p.write_text(RULE_PLUGIN)
        ps = PluginSet.load([PluginConfig(path=str(p),
                                          type="linker_rule")])
        assert not ps.errors
        cx = Cortex.in_memory()
        assert ps.attach(cx) == 1
        cx.store(Cortex.event("Event one happened today",
                              "First event body for the plugin test."))
        cx.store(Cortex.event("Event two happened today",
                              "Second event body for the plugin test."))
        cx.run_linker_cycle()
        edges = [e for n in cx.list_nodes()
                 for e in cx.storage.edges_from(n.id)]
        assert any(e.weight == 0.42 for e in edges)

    def test_export_plugin_listed(self, tmp_path):
        p = tmp_path / "txtexport.py"
        p.write_text(EXPORT_PLUGIN)
        ps = PluginSet.load([PluginConfig(path=str(p),
                                          type="export_format")])
        assert "txtexport" in ps.exporters()

    def test_bad_plugin_is_skipped(self, tmp_path):
        p = tmp_path / "broken.py"
        p.write_text("raise RuntimeError('boom')")
        ps = PluginSet.load([
            PluginConfig(path=str(p), type="linker_rule"),
            PluginConfig(path="/nope/missing.py", type="ingest"),
            PluginConfig(path=str(p), type="wat"),
        ])
        assert len(ps.errors) == 3
        assert ps.plugins == []

    def test_config_toml_parses_plugins(self, tmp_path):
        from cortex_tpu.config import CortexConfig
        toml = tmp_path / "cortex.toml"
        toml.write_text(
            '[[plugins]]\npath = "x.py"\ntype = "linker_rule"\n')
        cfg = CortexConfig.load(str(toml))
        assert cfg.plugins[0].type == "linker_rule"


class TestPromptMigrate:
    def migration_file(self, tmp_path):
        mig = {
            "prompts": [
                {"slug": "base", "type": "persona", "name": "Base",
                 "metadata": {"team": "core"}},
                {"slug": "helper", "type": "persona"},
            ],
            "versions": [
                {"slug": "base", "branch": "main", "version": 1,
                 "content": {"sections": {"intro": "be direct"}}},
                {"slug": "helper", "branch": "main", "version": 1,
                 "content": {"sections": {"style": "friendly"}}},
                {"slug": "helper", "branch": "main", "version": 2,
                 "content": {"sections": {"style": "warm"}}},
            ],
            "inheritance": [{"child": "helper", "parent": "base"}],
        }
        f = tmp_path / "mig.json"
        f.write_text(json.dumps(mig))
        return str(f)

    def test_dry_run(self, tmp_path, capsys):
        from cortex_tpu.cli.main import main
        f = self.migration_file(tmp_path)
        rc = main(["--json", "--data-dir", str(tmp_path / "d"),
                   "prompt", "migrate", f, "--dry-run"])
        out = json.loads(capsys.readouterr().out)
        assert rc == 0 and out["dry_run"] and out["versions"] == 3

    def test_migrate_and_resolve_inheritance(self, tmp_path, capsys):
        from cortex_tpu.cli.main import main
        f = self.migration_file(tmp_path)
        dd = str(tmp_path / "d")
        rc = main(["--json", "--data-dir", dd, "prompt", "migrate", f])
        out = json.loads(capsys.readouterr().out)
        assert rc == 0
        assert out["created"] == 3 and out["inheritance_links"] == 1
        # resolution walks inherits_from: helper HEAD merges base sections
        rc = main(["--json", "--data-dir", dd, "prompt", "get", "helper"])
        d = json.loads(capsys.readouterr().out)
        assert d["version"] == 2
        assert d["content"]["style"] == "warm"
        assert d["content"]["intro"] == "be direct"     # inherited
        assert d["lineage"] == ["base", "helper"]
        # idempotent: re-running skips everything
        rc = main(["--json", "--data-dir", dd, "prompt", "migrate", f])
        out = json.loads(capsys.readouterr().out)
        assert out["created"] == 0 and out["skipped"] == 3
