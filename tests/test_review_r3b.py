"""Regressions for the fourth self-review pass: MCP surface parity
(gate + selection/rollback bookkeeping), SSE bus thread-safety,
encoder eps round-trip, briefing cache bound, boot-failure guard
cleanup."""

import asyncio
import threading

import numpy as np
import pytest

from cortex_tpu.api import Cortex
from cortex_tpu.types import Edge, EdgeProvenance, Node, Source


class TestMcpSurfaceParity:
    def test_store_runs_the_write_gate(self):
        from cortex_tpu.errors import GateRejection
        from cortex_tpu.server.mcp import LocalBackend
        cx = Cortex.in_memory()
        be = LocalBackend(cx)
        with pytest.raises(GateRejection):
            be.store({"kind": "fact", "title": "short"})
        out = be.store({"kind": "fact",
                        "title": "A perfectly valid MCP title",
                        "body": "And a body long enough for the gate."})
        assert cx.get_node(out["id"]) is not None
        cx.close()

    def test_observe_updates_ema_and_rollback_like_http(self):
        """MCP observations must feed variant selection (uses-edge EMA,
        active_variant_id) and the rollback monitor — previously they
        recorded the node and stopped, so a degraded prompt served
        through MCP never rolled back."""
        from cortex_tpu.prompt import PromptContent
        from cortex_tpu.server.mcp import LocalBackend
        cx = Cortex.in_memory()
        agent = Cortex.agent("kai", "Kai the MCP test agent")
        cx.store(agent)
        pid = cx.prompts.create_prompt(PromptContent(slug="helper"))
        cx.create_edge(Edge.new(agent.id, pid, "uses", 0.5,
                                EdgeProvenance.manual("t")))
        be = LocalBackend(cx)
        out = be.observe({"agent": "kai", "variant_id": pid,
                          "sentiment_score": 0.9,
                          "correction_count": 0,
                          "task_outcome": "success"})
        assert out["old_weight"] == pytest.approx(0.5)
        assert out["new_weight"] != pytest.approx(0.5)
        uses = [e for e in cx.storage.edges_from(agent.id)
                if e.relation == "uses"]
        assert uses[0].weight == pytest.approx(out["new_weight"])
        fresh = cx.get_node(agent.id)
        assert fresh.metadata.get("active_variant_id") == pid
        assert "rollback" in out
        cx.close()


class TestEventBusThreadSafety:
    def test_cross_thread_publish_wakes_blocked_getter(self):
        """publish() from a worker thread (how hooks actually fire in
        the server) must deliver through the loop thread-safely — the
        old direct put_nowait left a blocked getter sleeping until an
        unrelated wakeup."""
        from cortex_tpu.server.observability import EventBus, GraphEvent

        async def run():
            bus = EventBus()
            bus.attach_loop(asyncio.get_running_loop())
            q = bus.subscribe()

            def worker():
                bus.publish(GraphEvent(event_type="node_created",
                                       timestamp=0.0, data={"id": "x"}))
            t = threading.Thread(target=worker)
            t.start()
            ev = await asyncio.wait_for(q.get(), timeout=5)
            t.join()
            return ev.data["id"]

        assert asyncio.run(run()) == "x"


class TestEncoderEpsRoundTrip:
    def test_layernorm_eps_survives_npz(self, tmp_path):
        from cortex_tpu.models.encoder import (BertEncoderConfig,
                                               init_params, load_npz,
                                               save_npz)
        cfg = BertEncoderConfig(vocab_size=64, hidden=16, layers=1,
                                heads=2, intermediate=32,
                                max_position=32, type_vocab=2,
                                layernorm_eps=1e-5)
        params = init_params(cfg, seed=0)
        p = str(tmp_path / "enc.npz")
        save_npz(p, params, cfg)
        _, cfg2 = load_npz(p)
        assert cfg2.layernorm_eps == pytest.approx(1e-5)


class TestBriefingCacheBound:
    def test_entries_bounded(self):
        from cortex_tpu.briefing.cache import BriefingCache
        c = BriefingCache(ttl_secs=300.0, max_entries=8)
        for i in range(50):
            c.put(f"agent-{i}", briefing=object(), version=1)
        assert len(c._entries) <= 8
        # the most recent entry survives
        assert "agent-49" in c._entries


class TestEncryptedGuardDataSafety:
    def _key(self, monkeypatch):
        from cortex_tpu.storage.encrypted import generate_key
        k = generate_key()
        monkeypatch.setenv("CORTEX_ENCRYPTION_KEY", k)
        return k

    def test_truncated_decrypt_never_masquerades_as_orphan(
            self, tmp_path, monkeypatch):
        """decrypt_file must be tmp+rename atomic: a crash mid-decrypt
        previously left a truncated .plain that the next boot resumed
        from and re-encrypted OVER the only good ciphertext."""
        import os
        from cortex_tpu.storage.encrypted import (EncryptedDbGuard,
                                                  decrypt_file,
                                                  derive_key)
        self._key(monkeypatch)
        key = derive_key()
        enc = str(tmp_path / "c.db.enc")
        guard = EncryptedDbGuard(enc, key)      # fresh db
        with open(guard.plain_path, "wb") as f:
            f.write(b"precious database bytes here")
        guard.close()
        assert os.path.exists(enc)
        # simulate the crash window: decrypt writes THROUGH a tmp, so
        # interrupting before the rename leaves no .plain at all
        captured = {}
        real_replace = os.replace

        def crash_replace(src, dst):
            if dst.endswith(".plain"):
                captured["tmp"] = src
                raise KeyboardInterrupt("crash mid-decrypt (test)")
            return real_replace(src, dst)
        monkeypatch.setattr(os, "replace", crash_replace)
        with pytest.raises(KeyboardInterrupt):
            decrypt_file(enc, enc + ".plain", key)
        monkeypatch.setattr(os, "replace", real_replace)
        assert not os.path.exists(enc + ".plain"), \
            "partial decrypt left a fake crash-orphan"
        # next boot decrypts cleanly from the intact ciphertext
        g2 = EncryptedDbGuard(enc, key)
        assert not g2.recovered_from_crash
        with open(g2.plain_path, "rb") as f:
            assert f.read() == b"precious database bytes here"
        g2.close()

    def test_close_checkpoints_wal_before_encrypting(
            self, tmp_path, monkeypatch):
        """Committed rows still in the -wal must survive a guard close
        that happens while the connection is open (context-manager
        exception path) — previously the -wal was deleted unmerged."""
        import sqlite3
        from cortex_tpu.storage.encrypted import (EncryptedDbGuard,
                                                  derive_key)
        self._key(monkeypatch)
        key = derive_key()
        enc = str(tmp_path / "c.db.enc")
        guard = EncryptedDbGuard(enc, key)
        db = sqlite3.connect(guard.plain_path)
        db.execute("PRAGMA journal_mode=WAL")
        db.execute("CREATE TABLE t (v TEXT)")
        db.execute("INSERT INTO t VALUES ('committed-in-wal')")
        db.commit()                     # committed, but lives in -wal
        guard.close()                   # connection still open!
        db.close()
        g2 = EncryptedDbGuard(enc, key)
        db2 = sqlite3.connect(g2.plain_path)
        rows = db2.execute("SELECT v FROM t").fetchall()
        db2.close()
        g2.close()
        assert rows == [("committed-in-wal",)]


class TestSdkClientFixes:
    def test_open_with_db_file_path(self, tmp_path):
        import sys
        sys.path.insert(0, "sdks/python")
        from cortex_memory import Cortex as Sdk
        db = str(tmp_path / "nested" / "mem.db")
        cx = Sdk.open(db)               # parent dir created, file form
        nid = cx.store("fact", "SDK file-path open works",
                       body="A body long enough for the write gate.")
        cx.close()
        cx2 = Sdk.open(db)              # existing FILE: no makedirs crash
        assert cx2.get_node(nid) is not None
        cx2.close()

    def test_embedded_gate_matches_remote_semantics(self, tmp_path):
        """gate=False now means what the server's gate=skip means:
        quality checks skipped, SCHEMA still enforced (previously the
        embedded path bypassed the whole gate while the remote path
        ran it, so identical code behaved differently per mode); and
        gate=True rejects duplicates in embedded mode like the server
        does."""
        import sys
        sys.path.insert(0, "sdks/python")
        from cortex_memory import Cortex as Sdk
        from cortex_tpu.config import CortexConfig
        from cortex_tpu.errors import GateRejection
        from cortex_tpu.gate.schema import KindSchema
        cfg = CortexConfig()
        cfg.schemas["decision"] = KindSchema(
            required_fields=["rationale"])
        cx = Sdk.open(str(tmp_path / "g"), cfg)
        # schema enforced even with gate=False (the gate=skip contract)
        with pytest.raises(GateRejection):
            cx.store("decision", "Decision missing its rationale",
                     body="A body long enough for any check here.",
                     gate=False)
        # duplicates rejected under gate=True, matching the server
        cx.store("fact", "Identical content stored twice here",
                 body="The very same body text both times, yes.",
                 gate=True)
        with pytest.raises(GateRejection):
            cx.store("fact", "Identical content stored twice here",
                     body="The very same body text both times, yes.",
                     gate=True)
        cx.close()


class TestDslFixes:
    def test_importance_gt_is_strict(self):
        from cortex_tpu.query import parse_and_compile
        flt = parse_and_compile("importance>0.7")
        assert flt.min_importance > 0.7
        flt2 = parse_and_compile("importance>=0.7")
        assert flt2.min_importance == pytest.approx(0.7)

    def test_three_tag_or_terms_compile(self):
        from cortex_tpu.query import parse_and_compile
        flt = parse_and_compile("tags:a OR tags:b OR tags:c")
        assert sorted(flt.tags_any) == ["a", "b", "c"]


class TestBootFailureGuardCleanup:
    def test_stop_runs_when_start_raises(self, tmp_path, monkeypatch):
        """A boot failure after open_embedded (e.g. port bound) must
        still run stop() so the encryption guard re-encrypts."""
        from cortex_tpu.config import CortexConfig
        from cortex_tpu.server import serve as serve_mod

        cfg = CortexConfig()
        cfg.server.data_dir = str(tmp_path / "data")
        cfg.server.warmup = False

        stopped = []
        orig_stop = serve_mod.Server.stop

        async def spy_stop(self):
            stopped.append(True)
            await orig_stop(self)

        monkeypatch.setattr(serve_mod.Server, "stop", spy_stop)

        def raise_on_grpc(*a, **k):
            raise OSError("port already bound (test)")
        monkeypatch.setattr(serve_mod, "create_grpc_server",
                            raise_on_grpc)
        with pytest.raises(OSError):
            serve_mod.run(cfg)
        assert stopped == [True]
