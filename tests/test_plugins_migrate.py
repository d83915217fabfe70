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

    def test_classifier_plugin_enriches_metadata(self, tmp_path):
        p = tmp_path / "clf.py"
        p.write_text(
            "def classify(node):\n"
            "    return 'ops' if 'deploy' in node.title.lower() else None\n")
        ps = PluginSet.load([PluginConfig(path=str(p), type="classifier")])
        cx = Cortex.in_memory()
        ps.attach(cx)
        nid = cx.store(Cortex.fact("Deploy pipeline uses blue-green"))
        other = cx.store(Cortex.fact("Unrelated memory about lunch plans"))
        assert cx.get_node(nid).metadata["classification"] == "ops"
        assert "classification" not in cx.get_node(other).metadata

    def test_briefing_section_plugin_adds_section(self, tmp_path):
        p = tmp_path / "sect.py"
        p.write_text(
            "def make_section(cortex):\n"
            "    def provider(agent_id):\n"
            "        ids = [n.id for n in cortex.list_nodes()\n"
            "               if 'pinned' in n.tags]\n"
            "        return ('Pinned', ids)\n"
            "    return provider\n")
        cx = Cortex.in_memory()
        cx.store(Cortex.agent("pilot", "An agent with pinned memories"))
        pinned = Cortex.fact("Always check the runway checklist")
        pinned.tags = ["pinned"]
        cx.store(pinned)
        ps = PluginSet.load([PluginConfig(path=str(p),
                                          type="briefing_section")])
        assert ps.attach(cx) == 1
        text = cx.briefing("pilot")
        assert "Pinned" in text and "runway checklist" in text

    def test_export_format_plugin_via_cli(self, tmp_path, capsys):
        from cortex_tpu.cli.main import main
        plug = tmp_path / "titles.py"
        plug.write_text(
            "def export(nodes, edges):\n"
            "    return '\\n'.join(n.title for n in nodes)\n")
        cfg = tmp_path / "cortex.toml"
        cfg.write_text(
            f'[[plugins]]\npath = "{plug}"\ntype = "export_format"\n')
        dd = str(tmp_path / "d")
        main(["--config", str(cfg), "--data-dir", dd, "node", "create",
              "fact", "Exported title appears",
              "Body long enough to satisfy the write gate checks."])
        capsys.readouterr()
        rc = main(["--config", str(cfg), "--data-dir", dd, "export",
                   "--format", "titles"])
        out = capsys.readouterr().out
        assert rc == 0 and out.strip() == "Exported title appears"
        rc = main(["--config", str(cfg), "--data-dir", dd, "export",
                   "--format", "nope"])
        assert rc == 1

    def test_shipped_example_plugins_load_and_work(self):
        """The four examples/plugins/ files must load and function."""
        import os
        base = os.path.join(os.path.dirname(__file__), "..", "examples",
                            "plugins")
        ps = PluginSet.load([
            PluginConfig(path=os.path.join(base, "link_incidents.py"),
                         type="linker_rule"),
            PluginConfig(path=os.path.join(base, "csv_export.py"),
                         type="export_format"),
            PluginConfig(path=os.path.join(base,
                                           "priority_classifier.py"),
                         type="classifier"),
            PluginConfig(path=os.path.join(base, "pinned_section.py"),
                         type="briefing_section"),
        ])
        assert not ps.errors, ps.errors
        cx = Cortex.in_memory()
        assert ps.attach(cx) == 3          # rule + classifier + section
        assert "csv_export" in ps.exporters()
        nid = cx.store(Cortex.fact("SEV1 outage in the payments path"))
        assert cx.get_node(nid).metadata["classification"] == "urgent"
        csv_text = ps.exporters()["csv_export"](cx.list_nodes(), [])
        assert "SEV1 outage" in csv_text

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
