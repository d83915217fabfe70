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
