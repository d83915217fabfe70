"""Webhook dispatch, tracing utils, and repair command tests."""

import json
import threading
import time

import numpy as np

from cortex_tpu.api import Cortex
from cortex_tpu.server.webhooks import WebhookEndpoint, WebhookHook
from cortex_tpu.utils import span, timed
from cortex_tpu.utils.tracing import reset_stats, stats


class TestWebhooks:
    def make_hook(self, events=None):
        delivered = []
        done = threading.Event()

        def transport(ep, body):
            delivered.append((ep.url, json.loads(body)))
            done.set()
        hook = WebhookHook([WebhookEndpoint("http://x/hook", events)],
                           transport=transport)
        return hook, delivered, done

    def test_node_mutations_delivered(self):
        hook, delivered, done = self.make_hook()
        cx = Cortex.in_memory()
        cx.add_hook(hook)
        cx.store(Cortex.fact("A webhook-worthy fact appears"))
        assert done.wait(3.0)
        hook.close()
        assert delivered
        url, ev = delivered[0]
        assert ev["event_type"] == "node_created"
        assert ev["data"]["kind"] == "fact"

    def test_event_filtering(self):
        hook, delivered, done = self.make_hook(events=["edge_created"])
        cx = Cortex.in_memory()
        cx.add_hook(hook)
        a = cx.store(Cortex.fact("first fact for edge test"))
        b = cx.store(Cortex.fact("second fact for edge test"))
        from cortex_tpu.types import Edge, EdgeProvenance
        cx.create_edge(Edge.new(a, b, "related_to", 0.5,
                                EdgeProvenance.manual("t")))
        assert done.wait(3.0)
        hook.close()
        assert all(ev["event_type"] == "edge_created"
                   for _, ev in delivered)
        assert len(delivered) == 1

    def test_failures_never_raise(self):
        def bad_transport(ep, body):
            raise ConnectionError("refused")
        hook = WebhookHook([WebhookEndpoint("http://x/hook")],
                           transport=bad_transport)
        cx = Cortex.in_memory()
        cx.add_hook(hook)
        cx.store(Cortex.fact("failure tolerated fact"))   # must not raise
        time.sleep(0.2)
        hook.close()
        assert hook.failed >= 1


class TestTracing:
    def test_span_stats(self):
        reset_stats()
        with span("unit"):
            time.sleep(0.01)
        with span("unit"):
            pass
        s = stats()["unit"]
        assert s.count == 2
        assert s.total_s >= 0.01
        assert s.max_s >= 0.01

    def test_timed_decorator(self):
        reset_stats()

        @timed("deco-test")
        def f(x):
            return x * 2
        assert f(4) == 8
        assert stats()["deco-test"].count == 1


class TestRepair:
    def test_repair_fixes_and_backs_up(self, tmp_path, capsys):
        import os
        from cortex_tpu.cli.main import main

        data_dir = str(tmp_path / "data")
        # seed a healthy store
        rc = main(["--data-dir", data_dir, "node", "create", "fact",
                   "Healthy node stays as is",
                   "A perfectly fine node body for repair testing."])
        assert rc == 0
        capsys.readouterr()
        # corrupt it: out-of-range importance + dangling edge via raw sql
        import sqlite3
        db = os.path.join(data_dir, "cortex.db")
        con = sqlite3.connect(db)
        con.execute("UPDATE nodes SET importance=7.5")
        con.commit()
        con.close()

        rc = main(["--json", "--data-dir", data_dir, "repair"])
        out = capsys.readouterr().out
        assert rc == 0
        rep = json.loads(out)
        assert rep["fixed_nodes"] == 1
        assert os.path.exists(rep["backup"])
        # store is now clean
        rc = main(["--data-dir", data_dir, "doctor"])
        assert rc == 0
