"""CLI tests — drives cortex_tpu.cli.main in-process.

Parity model: reference cli/mod.rs command surface (21 families).
"""

import json
import os

import pytest

from cortex_tpu.cli.main import main


def run(capsys, *argv):
    code = main(list(argv))
    out = capsys.readouterr()
    return code, out.out, out.err


@pytest.fixture
def data_dir(tmp_path):
    return str(tmp_path / "data")


class TestBasicCommands:
    def test_init_create_get_list_delete(self, capsys, data_dir):
        code, out, _ = run(capsys, "--data-dir", data_dir, "init")
        assert code == 0 and "initialized" in out
        code, out, _ = run(capsys, "--data-dir", data_dir, "node", "create",
                           "fact", "CLI test fact title here",
                           "A body with enough substance for the gate.",
                           "--tag", "cli")
        assert code == 0
        nid = out.strip().split()[-1]
        code, out, _ = run(capsys, "--data-dir", data_dir, "node", "get", nid)
        assert code == 0 and "CLI test fact" in out
        code, out, _ = run(capsys, "--json", "--data-dir", data_dir,
                           "node", "list", "--kind", "fact")
        assert code == 0
        assert len(json.loads(out)) == 1
        code, out, _ = run(capsys, "--data-dir", data_dir, "node", "delete",
                           nid)
        assert code == 0
        code, out, _ = run(capsys, "--json", "--data-dir", data_dir,
                           "node", "list")
        assert json.loads(out) == []

    def test_gate_rejects_thin_node(self, capsys, data_dir):
        code, _, err = run(capsys, "--data-dir", data_dir, "node", "create",
                           "fact", "tiny", "x")
        assert code == 1 and "error" in err
        # --no-gate bypasses
        code, _, _ = run(capsys, "--data-dir", data_dir, "node", "create",
                         "fact", "tiny", "x", "--no-gate")
        assert code == 0

    def test_search_and_stats(self, capsys, data_dir):
        run(capsys, "--data-dir", data_dir, "node", "create", "fact",
            "Kubernetes cluster autoscaling configuration",
            "The cluster autoscaler scales node pools based on pending pods.")
        code, out, _ = run(capsys, "--json", "--data-dir", data_dir,
                           "search", "cluster autoscaling", "--limit", "3")
        assert code == 0
        rows = json.loads(out)
        assert rows and "autoscaling" in rows[0]["node"]["data"]["title"]
        code, out, _ = run(capsys, "--data-dir", data_dir, "stats")
        assert code == 0 and "nodes: 1" in out

    def test_edge_and_traverse_and_path(self, capsys, data_dir):
        _, o1, _ = run(capsys, "--json", "--data-dir", data_dir, "node",
                       "create", "decision", "Use blue-green deployments",
                       "We decided to use blue-green deploys for safety.")
        _, o2, _ = run(capsys, "--json", "--data-dir", data_dir, "node",
                       "create", "event", "Deployed v2 with blue-green",
                       "The v2 release used the blue-green deploy path.")
        id1, id2 = json.loads(o1)["id"], json.loads(o2)["id"]
        code, out, _ = run(capsys, "--data-dir", data_dir, "edge", "create",
                           id1, id2, "led_to", "--weight", "0.8")
        assert code == 0
        code, out, _ = run(capsys, "--data-dir", data_dir, "edge", "list",
                           id1)
        assert "led_to" in out
        code, out, _ = run(capsys, "--json", "--data-dir", data_dir,
                           "traverse", id1, "--depth", "2")
        d = json.loads(out)
        assert len(d["nodes"]) == 2
        code, out, _ = run(capsys, "--json", "--data-dir", data_dir, "path",
                           id1, id2)
        paths = json.loads(out)
        assert paths and paths[0]["nodes"] == [id1, id2]

    def test_query_dsl(self, capsys, data_dir):
        run(capsys, "--data-dir", data_dir, "node", "create", "fact",
            "Important fact about the system",
            "This fact has high importance for later filtering.",
            "--importance", "0.9", "--no-gate")
        run(capsys, "--data-dir", data_dir, "node", "create", "fact",
            "Minor fact about the system",
            "This fact has low importance for later filtering.",
            "--importance", "0.1")
        code, out, _ = run(capsys, "--json", "--data-dir", data_dir,
                           "query", "kind:fact AND importance>0.5")
        rows = json.loads(out)
        assert len(rows) == 1 and "Important" in rows[0]["data"]["title"]

    def test_audit(self, capsys, data_dir):
        run(capsys, "--data-dir", data_dir, "node", "create", "fact",
            "Audited node creation event",
            "Creating this node must appear in the audit trail.")
        code, out, _ = run(capsys, "--json", "--data-dir", data_dir, "audit")
        rows = json.loads(out)
        assert any(r["action"] == "node_created" for r in rows)

    def test_config_and_security(self, capsys, data_dir):
        code, out, _ = run(capsys, "--data-dir", data_dir, "config",
                           "validate")
        assert code == 0 and "OK" in out
        code, out, _ = run(capsys, "--data-dir", data_dir, "config", "show")
        assert json.loads(out)["server"]["data_dir"] == data_dir
        code, out, _ = run(capsys, "security", "generate-key")
        assert code == 0
        import base64
        assert len(base64.b64decode(out.strip())) == 32


class TestEncryptedCli:
    def test_cli_honors_encryption_at_rest(self, tmp_path, monkeypatch,
                                           capsys):
        """Regression: CLI must open the same encrypted store the
        server uses, not a parallel plaintext cortex.db."""
        from cortex_tpu.storage.encrypted import generate_key
        monkeypatch.setenv("CORTEX_ENCRYPTION_KEY", generate_key())
        cfg = tmp_path / "cortex.toml"
        cfg.write_text("[security]\nencryption_at_rest = true\n")
        dd = str(tmp_path / "data")
        rc = main(["--config", str(cfg), "--data-dir", dd, "node",
                   "create", "fact", "Encrypted CLI write persists",
                   "The CLI writes into the encrypted store directly."])
        assert rc == 0
        capsys.readouterr()
        import os
        assert os.path.exists(os.path.join(dd, "cortex.db.enc"))
        assert not os.path.exists(os.path.join(dd, "cortex.db"))
        blob = open(os.path.join(dd, "cortex.db.enc"), "rb").read()
        assert b"Encrypted CLI write" not in blob
        rc = main(["--json", "--config", str(cfg), "--data-dir", dd,
                   "node", "list"])
        out = capsys.readouterr().out
        assert rc == 0 and len(json.loads(out)) == 1


class TestDataLifecycle:
    def test_import_jsonl_csv_markdown(self, capsys, data_dir, tmp_path):
        jl = tmp_path / "in.jsonl"
        jl.write_text(json.dumps({"kind": "fact", "title": "jsonl row one",
                                  "body": "body of the first row"}) + "\n")
        code, out, _ = run(capsys, "--data-dir", data_dir, "import", str(jl))
        assert code == 0 and "1 nodes" in out
        cv = tmp_path / "in.csv"
        cv.write_text("kind,title,body,tags\n"
                      "decision,csv decision row,detailed body,a;b\n")
        code, out, _ = run(capsys, "--data-dir", data_dir, "import", str(cv))
        assert code == 0 and "1 nodes" in out
        md = tmp_path / "doc.md"
        md.write_text("# Doc\n\nSome markdown content to import as a node.")
        code, out, _ = run(capsys, "--data-dir", data_dir, "import", str(md))
        assert code == 0
        code, out, _ = run(capsys, "--json", "--data-dir", data_dir,
                           "node", "list")
        assert len(json.loads(out)) == 3

    def test_export_backup_restore_roundtrip(self, capsys, data_dir,
                                             tmp_path):
        run(capsys, "--data-dir", data_dir, "node", "create", "fact",
            "Durable node for roundtrip",
            "This node must survive export, backup and restore.")
        exp = tmp_path / "graph.json"
        code, _, _ = run(capsys, "--data-dir", data_dir, "export", "-o",
                         str(exp))
        assert code == 0
        dump = json.loads(exp.read_text())
        assert len(dump["nodes"]) == 1 and dump["schema_version"] == 2
        snap = tmp_path / "snap.db"
        code, _, _ = run(capsys, "--data-dir", data_dir, "backup", "-o",
                         str(snap))
        assert code == 0 and snap.exists()
        dd2 = str(tmp_path / "data2")
        code, _, _ = run(capsys, "--data-dir", dd2, "restore", str(snap))
        assert code == 0
        code, out, _ = run(capsys, "--data-dir", dd2, "stats")
        assert "nodes: 1" in out
        # import the export into a third store (re-import path)
        dd3 = str(tmp_path / "data3")
        code, out, _ = run(capsys, "--data-dir", dd3, "import", str(exp))
        assert code == 0 and "1 nodes" in out

    def test_import_rust_reference_export_shape(self, capsys, data_dir,
                                                tmp_path):
        """The Rust engine's `cortex export` JSON ({nodes:[{id, kind,
        title, body, importance, tags, source_agent}], edges:[{id,
        from_id, to_id, relation, weight}]}) must import with ids and
        edges intact (docs/guides/migration.md promise)."""
        dump = {
            "nodes": [
                {"id": "00000000-0000-7000-8000-00000000aaaa",
                 "kind": "decision", "title": "Rust-exported decision",
                 "body": "We decided something in the old engine.",
                 "importance": 0.8, "tags": ["legacy"],
                 "source_agent": "old-agent"},
                {"id": "00000000-0000-7000-8000-00000000bbbb",
                 "kind": "event", "title": "Rust-exported event",
                 "body": "The decision led to this event.",
                 "importance": 0.4, "tags": [],
                 "source_agent": "old-agent"},
            ],
            "edges": [
                {"id": "e-1",
                 "from_id": "00000000-0000-7000-8000-00000000aaaa",
                 "to_id": "00000000-0000-7000-8000-00000000bbbb",
                 "relation": "led_to", "weight": 0.9},
            ],
        }
        f = tmp_path / "rust-export.json"
        f.write_text(json.dumps(dump))
        code, out, _ = run(capsys, "--data-dir", data_dir, "import",
                           str(f))
        assert code == 0 and "2 nodes, 1 edges" in out
        code, out, _ = run(capsys, "--json", "--data-dir", data_dir,
                           "node", "get",
                           "00000000-0000-7000-8000-00000000aaaa")
        d = json.loads(out)
        assert d["source"]["agent"] == "old-agent"
        assert d["importance"] == 0.8
        code, out, _ = run(capsys, "--json", "--data-dir", data_dir,
                           "traverse",
                           "00000000-0000-7000-8000-00000000aaaa")
        assert len(json.loads(out)["nodes"]) == 2   # edge re-linked

    def test_export_dot_and_graphml(self, capsys, data_dir, tmp_path):
        _, o1, _ = run(capsys, "--json", "--data-dir", data_dir, "node",
                       "create", "decision", "Graph export decision",
                       "We decided to export to the visual formats.")
        _, o2, _ = run(capsys, "--json", "--data-dir", data_dir, "node",
                       "create", "event", "Graph export event",
                       "The outcome of the exported decision node.")
        id1, id2 = json.loads(o1)["id"], json.loads(o2)["id"]
        run(capsys, "--data-dir", data_dir, "edge", "create", id1, id2,
            "led_to")
        code, out, _ = run(capsys, "--data-dir", data_dir, "export",
                           "--format", "dot")
        assert code == 0 and out.startswith("digraph cortex")
        assert f'"{id1[:8]}" -> "{id2[:8]}" [label="led_to"]' in out
        code, out, _ = run(capsys, "--data-dir", data_dir, "export",
                           "--format", "graphml")
        assert code == 0 and "<graphml" in out
        assert f'source="{id1}" target="{id2}"' in out
        code, out, _ = run(capsys, "--data-dir", data_dir, "export",
                           "--format", "jsonl")
        assert code == 0 and len(out.strip().splitlines()) == 2

    def test_import_skips_existing_ids(self, capsys, data_dir, tmp_path):
        """Re-importing a backup into a live store must not clobber
        current node content (import is additive)."""
        dump = {"nodes": [
            {"id": "00000000-0000-7000-8000-00000000cccc",
             "kind": "fact", "title": "Original title from import",
             "body": "Original body.", "importance": 0.5,
             "tags": [], "source_agent": "old"}]}
        f = tmp_path / "d.json"
        f.write_text(json.dumps(dump))
        run(capsys, "--data-dir", data_dir, "import", str(f))
        # mutate the live node, then re-import the stale dump
        dump["nodes"][0]["title"] = "Stale title that must NOT win"
        f.write_text(json.dumps(dump))
        code, out, _ = run(capsys, "--data-dir", data_dir, "import",
                           str(f))
        assert code == 0 and "1 already existed, skipped" in out
        code, out, _ = run(capsys, "--json", "--data-dir", data_dir,
                           "node", "get",
                           "00000000-0000-7000-8000-00000000cccc")
        assert json.loads(out)["data"]["title"] == \
            "Original title from import"

    def test_restore_refuses_overwrite(self, capsys, data_dir, tmp_path):
        run(capsys, "--data-dir", data_dir, "init")
        snap = tmp_path / "s.db"
        run(capsys, "--data-dir", data_dir, "backup", "-o", str(snap))
        code, _, err = run(capsys, "--data-dir", data_dir, "restore",
                           str(snap))
        assert code == 1 and "--force" in err
        code, _, _ = run(capsys, "--data-dir", data_dir, "restore",
                         str(snap), "--force")
        assert code == 0

    def test_doctor_and_migrate(self, capsys, data_dir):
        run(capsys, "--data-dir", data_dir, "init")
        code, out, _ = run(capsys, "--data-dir", data_dir, "doctor")
        assert code == 0 and "[ok]" in out and "FAIL" not in out
        code, out, _ = run(capsys, "--data-dir", data_dir, "migrate")
        assert code == 0 and "already at schema v2" in out


class TestAgentPrompt:
    def seed(self, capsys, data_dir):
        run(capsys, "--data-dir", data_dir, "prompt", "create",
            "helper-persona", "--sections", '{"intro": "be helpful"}')
        run(capsys, "--data-dir", data_dir, "agent", "bind", "helper",
            "helper-persona")

    def test_bind_resolve_select(self, capsys, data_dir):
        self.seed(capsys, data_dir)
        code, out, _ = run(capsys, "--json", "--data-dir", data_dir,
                           "agent", "resolve", "helper")
        d = json.loads(out)
        assert d["slug"] == "helper-persona"
        assert d["content"]["intro"] == "be helpful"
        code, out, _ = run(capsys, "--json", "--data-dir", data_dir,
                           "agent", "select", "helper")
        scores = json.loads(out)
        assert scores and scores[0]["edge_weight"] == 0.5
        code, out, _ = run(capsys, "--json", "--data-dir", data_dir,
                           "agent", "list")
        assert json.loads(out)[0]["bound_prompts"] == 1
        code, out, _ = run(capsys, "--data-dir", data_dir, "agent",
                           "unbind", "helper", "helper-persona")
        assert "1 binding" in out

    def test_deploy_observe_history_status(self, capsys, data_dir):
        self.seed(capsys, data_dir)
        code, out, _ = run(capsys, "--data-dir", data_dir, "prompt",
                           "deploy", "helper-persona")
        assert code == 0 and "deployed" in out
        _, out, _ = run(capsys, "--json", "--data-dir", data_dir,
                        "prompt", "list")
        variant_id = json.loads(out)[0]["node_id"]
        code, out, _ = run(capsys, "--data-dir", data_dir, "agent",
                           "observe", "helper", variant_id,
                           "--sentiment", "0.9", "--outcome", "success")
        assert code == 0 and "recorded observation" in out
        code, out, _ = run(capsys, "--json", "--data-dir", data_dir,
                           "agent", "history", "helper")
        assert len(json.loads(out)) == 1
        code, out, _ = run(capsys, "--json", "--data-dir", data_dir,
                           "prompt", "rollback-status", "helper-persona")
        d = json.loads(out)
        assert d["slug"] == "helper-persona"
        assert d["active_deployment"] is not None
        code, out, _ = run(capsys, "--json", "--data-dir", data_dir,
                           "prompt", "performance", "helper-persona")
        perf = json.loads(out)
        assert perf[0]["observations"] == 1

    def test_prompt_get_missing(self, capsys, data_dir):
        code, _, err = run(capsys, "--data-dir", data_dir, "prompt", "get",
                           "nope")
        assert code == 1 and "not found" in err


class TestShellParsing:
    def test_shell_dispatch(self, data_dir, monkeypatch, capsys):
        import io
        import sys
        from cortex_tpu.cli.main import build_parser
        from cortex_tpu.cli.shell import run_shell
        args = build_parser().parse_args(["--data-dir", data_dir, "shell"])
        monkeypatch.setattr(sys, "stdin", io.StringIO(
            'node create fact "Shell created node title" '
            '"A body long enough to pass the gate checks."\n'
            "stats\nexit\n"))
        monkeypatch.setattr("builtins.input",
                            lambda prompt="": sys.stdin.readline().rstrip(
                                "\n") or (_ for _ in ()).throw(EOFError))
        code = run_shell(args)
        out = capsys.readouterr().out
        assert code == 0
        assert "created" in out and "nodes: 1" in out
