"""Serve orchestration — the composition root.

Parity: cortex-server/src/serve.rs:33-459. Boot order: auth validation
-> optional decrypt-at-rest (EncryptedDbGuard) -> storage + audit ->
embedder -> device index rebuild from stored embeddings -> graph engine
-> auto-linker (cursor restore) -> briefing engine + graph version ->
SSE event bus + hook -> metrics -> background tasks (auto-linker loop
with retention sweep/purge + metrics mirror, briefing precomputer, file
ingest) -> gRPC server with bearer interceptor -> HTTP server with
auth/metrics middleware -> signal-driven shutdown that aborts tasks and
re-encrypts the DB via the guard (serve.rs:448-458, 21-31).

All background work is asyncio tasks driving the embedded `Cortex`
(the reference's tokio tasks, SURVEY §2.4 mapping).
"""

from __future__ import annotations

import asyncio
import contextlib
import gc
import logging
import os
import signal
from typing import List, Optional

from aiohttp import web

from ..api import Cortex
from ..briefing.precompute import BriefingPrecomputer, agents_from_env
from ..config import CortexConfig
from ..errors import ConfigError
from ..ingest import FileIngest
from ..storage.encrypted import EncryptedDbGuard
from .grpc_service import create_grpc_server
from .http import create_app
from .state import ServerState

log = logging.getLogger("cortex.serve")

DB_FILENAME = "cortex.db"
ENC_SUFFIX = ".enc"


def open_storage_path(config: CortexConfig) -> str:
    os.makedirs(config.server.data_dir, exist_ok=True)
    return os.path.join(config.server.data_dir, DB_FILENAME)


class Server:
    """Composed server. `await Server.start(config)` boots everything;
    `await .stop()` tears down in reverse order."""

    def __init__(self, config: CortexConfig):
        self.config = config
        self.cortex: Optional[Cortex] = None
        self.state: Optional[ServerState] = None
        self.guard: Optional[EncryptedDbGuard] = None
        self.grpc_server = None
        self.webhooks = None
        self.http_runner: Optional[web.AppRunner] = None
        self.tasks: List[asyncio.Task] = []
        self.http_port: Optional[int] = None
        self.grpc_port: Optional[int] = None
        # dedicated executor for linker/retention cycles: cancelling
        # the loop task abandons the await but NOT the worker thread,
        # so stop() joins this executor before cortex.close() — a
        # close-time snapshot must never race an in-flight cycle's
        # store+index writes (ADVICE r2 #1)
        from concurrent.futures import ThreadPoolExecutor
        self._cycle_executor = ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="linker-cycle")

    # ----------------------------------------------------------------- boot
    async def start(self) -> None:
        config = self.config
        config.validate()

        from ..api import open_embedded
        # attributable boot: open_embedded's first device touch is the
        # silent phase of a cold boot (backend handshake + snapshot
        # upload) — announce it, and its bound, before entering it
        log.info("boot: opening engine (device preflight bounded, "
                 "$CORTEX_DEVICE_PREFLIGHT_TIMEOUT_S)")
        self.cortex, self.guard = open_embedded(config)
        mesh = getattr(self.cortex.index, "mesh", None)
        if mesh is not None:
            log.info("boot: serving index %s on mesh %s",
                     type(self.cortex.index).__name__,
                     dict(mesh.shape))
        else:
            log.info("boot: serving index %s (single device)",
                     type(self.cortex.index).__name__)
        self.state = ServerState(self.cortex)
        self.state.loop = asyncio.get_running_loop()
        # SSE bus: hooks fire on worker threads; publishes must hop
        # onto this loop thread-safely (observability.EventBus)
        self.state.bus.attach_loop(self.state.loop)
        self.state.enable_batched_admission()
        if config.server.search_batching:
            self.state.enable_batched_search()
        self.state.metrics.mirror_storage(self.cortex.stats())

        from .webhooks import from_config as webhooks_from_config
        self.webhooks = webhooks_from_config(config.webhooks)
        if self.webhooks is not None:
            self.cortex.add_hook(self.webhooks)

        if config.plugins:
            from ..plugins import PluginSet
            self.plugins = PluginSet.load(config.plugins)
            attached = self.plugins.attach(self.cortex)
            adapters = self.plugins.adapters()
            if adapters:
                self.tasks.append(asyncio.create_task(
                    self._adapter_loop(adapters,
                                       config.ingest.file.interval_secs),
                    name="plugin-ingest"))
            log.info("plugins: %d attached, %d ingest adapters, "
                     "%d errors", attached, len(adapters),
                     len(self.plugins.errors))

        if config.server.warmup:
            # BEFORE the background loops spawn: warmup compiles must
            # not run concurrently with the linker's first cycle —
            # overlapping compile/fetch RPCs from two threads is
            # exactly the pattern that wedges a tunneled device
            # transport (observed repeatedly under axon). Bounded: a
            # wedged warmup RPC must not hang boot forever — serve
            # cold instead (requests then pay first-compile latency,
            # protected by the fetch watchdog in vector.shard). The
            # abandoned thread's compiles still land in the cache if
            # they ever finish.
            try:
                await asyncio.wait_for(
                    asyncio.to_thread(self._warmup),
                    timeout=float(os.environ.get(
                        "CORTEX_WARMUP_TIMEOUT_S", "600")))
            except asyncio.TimeoutError:
                log.warning("device warmup exceeded its deadline; "
                            "serving with cold compile caches")

        # background tasks (serve.rs:176-290)
        self.tasks.append(asyncio.create_task(
            self._linker_loop(), name="auto-linker"))
        precomputer = BriefingPrecomputer(
            self.cortex.briefing_engine, agents_from_env())
        if precomputer.agents:
            self.tasks.append(asyncio.create_task(
                self._precompute_loop(precomputer), name="briefing-precompute"))
        if config.ingest.file.enabled:
            ingest = FileIngest(
                self.cortex,
                os.environ.get("CORTEX_INGEST_DIR",
                               config.ingest.file.watch_dir))
            self.tasks.append(asyncio.create_task(
                self._ingest_loop(ingest, config.ingest.file.interval_secs),
                name="file-ingest"))
        if config.ingest.stdin_enabled:
            self.tasks.append(asyncio.create_task(
                self._stdin_loop(), name="stdin-ingest"))
        if config.server.nats_url:
            # warren/NATS consumer: the event schema + node conversion
            # live in ingest.warren; transport needs a NATS client,
            # which this build gates on availability — connection
            # failure degrades to "continue without consumer"
            # (reference serve.rs:427-431 posture)
            self.tasks.append(asyncio.create_task(
                self._nats_loop(config.server.nats_url),
                name="nats-ingest"))

        # gRPC (serve.rs:292-339)
        self.grpc_server = create_grpc_server(
            self.state, config.server.grpc_addr)
        self.grpc_server.start()
        self.grpc_port = int(config.server.grpc_addr.rsplit(":", 1)[1])

        # HTTP (serve.rs:341-400)
        app = create_app(self.state)
        self.http_runner = web.AppRunner(app)
        await self.http_runner.setup()
        host, port = config.server.http_addr.rsplit(":", 1)
        site = web.TCPSite(self.http_runner, host, int(port))
        await site.start()
        self.http_port = int(port)

        # Freeze boot-time objects out of GC tracking: at scale the
        # adjacency cache + index maps are millions of long-lived
        # Python objects, and every gen-2 collection triggered by
        # request allocations scans them all (measured: a 2ms device
        # scan read as 400ms inside a loop sharing the process with a
        # 10M-object cache). Frozen objects are permanent — rebuilt
        # caches allocate fresh (tracked) objects, so this is a boot
        # optimization, not a leak of churn.
        gc.collect()
        gc.freeze()

        log.info("cortex serving: grpc=%s http=%s data=%s",
                 config.server.grpc_addr, config.server.http_addr,
                 config.server.data_dir)

    def _warmup(self) -> None:
        """Pre-compile the hot device programs on a throwaway corpus
        BEFORE the ports open — first-compile latency belongs to boot,
        not to the first user request. The body is shared with
        library-mode warmup (Cortex._warmup_body); the reference's
        preflight (redb_storage.rs:126-158) fails fast at boot for the
        same reason."""
        self.cortex._warmup_body(log.info)

    # ----------------------------------------------------------- background
    async def _linker_loop(self) -> None:
        """Every interval: linker cycle -> metrics mirror -> retention
        sweep/purge (serve.rs:194-235). Errors log-and-continue."""
        from ..utils import span
        interval = self.config.auto_linker.interval_secs
        loop = asyncio.get_running_loop()

        def in_cycle_thread(fn, *args):
            return loop.run_in_executor(self._cycle_executor, fn, *args)

        while True:
            await asyncio.sleep(interval)
            try:
                with span("linker.cycle", level=logging.INFO):
                    m = await in_cycle_thread(
                        self.cortex.run_linker_cycle)
                self.state.metrics.mirror_linker(m)
                self.state.metrics.mirror_storage(self.cortex.stats())
                with span("retention.sweep"):
                    await in_cycle_thread(self.cortex.run_retention)
                if self.guard is not None:
                    # bound the crash window: re-encrypt a consistent
                    # snapshot so the at-rest copy never lags a clean
                    # shutdown by more than one linker interval
                    with span("encryption.checkpoint"):
                        await in_cycle_thread(
                            self.guard.checkpoint,
                            self.cortex.storage.snapshot)
                else:
                    # index snapshot checkpoint: a crash then boots from
                    # the last checkpoint instead of a full rebuild
                    # (no-op when nothing changed since the last save;
                    # disabled entirely in encrypted mode — plaintext)
                    with span("index.snapshot"):
                        await in_cycle_thread(
                            lambda: self.cortex.save_index_snapshot(
                                min_delta=self.config.embedding
                                .snapshot_min_delta))
            except Exception:
                log.exception("auto-linker cycle failed (continuing)")

    async def _precompute_loop(self, pre: BriefingPrecomputer) -> None:
        while True:
            await asyncio.sleep(pre.interval_secs)
            try:
                await asyncio.to_thread(pre.run_once)
            except Exception:
                log.exception("briefing precompute failed (continuing)")

    async def _adapter_loop(self, adapters, interval: float) -> None:
        """Poll ingest-plugin adapters; each event batch becomes one
        store_batch (one device embed per poll)."""
        while True:
            await asyncio.sleep(interval)
            for adapter in adapters:
                try:
                    events = await asyncio.to_thread(adapter.poll)
                    nodes = [ev.to_node() for ev in events]
                    if nodes:
                        await asyncio.to_thread(
                            self.cortex.store_batch, nodes,
                            actor=getattr(adapter, "name", "plugin"))
                except Exception:
                    log.exception("ingest adapter failed (continuing)")

    async def _ingest_loop(self, ingest: FileIngest,
                           interval: float) -> None:
        while True:
            await asyncio.sleep(interval)
            try:
                report = await asyncio.to_thread(ingest.scan_once)
                if report.files_processed:
                    log.info("file ingest: %d files -> %d nodes",
                             report.files_processed, report.nodes_created)
            except Exception:
                log.exception("file ingest failed (continuing)")

    async def _stdin_loop(self, stream=None) -> None:
        """JSONL events on stdin -> batched node admission
        (cortex-server/src/ingest/stdin.rs). Batches flush at 32 events
        OR after 1s of quiet, so a trickling producer's events are not
        withheld; any malformed line is skipped (log-and-continue)."""
        import sys
        from ..ingest import IngestEvent
        stream = stream if stream is not None else sys.stdin
        loop = asyncio.get_running_loop()
        buffer = []

        async def flush():
            if not buffer:
                return
            batch, buffer[:] = list(buffer), []
            try:
                await asyncio.to_thread(
                    self.cortex.store_batch,
                    [e.to_node() for e in batch], actor="stdin")
            except Exception:
                log.exception("stdin ingest batch failed (continuing)")

        pending = None
        while True:
            if pending is None:
                pending = loop.run_in_executor(None, stream.readline)
            done, _ = await asyncio.wait({pending}, timeout=1.0)
            if not done:            # quiet second: flush the trickle
                await flush()
                continue
            line = pending.result()
            pending = None
            if not line:            # EOF: flush and stop
                await flush()
                return
            line = line.strip()
            if not line:
                continue
            try:
                import json as _json
                buffer.append(IngestEvent.from_json(_json.loads(line)))
            except Exception:       # noqa: BLE001 — any malformed frame
                log.debug("stdin: skipping malformed line")
            if len(buffer) >= 32:   # batch admission
                await flush()

    async def _nats_loop(self, url: str) -> None:
        try:
            import nats  # type: ignore  # official client when present
        except ImportError:
            # zero-dependency fallback: the in-repo core-protocol
            # client (ingest/nats_client.py) — the transport runs
            # either way
            from ..ingest import nats_client as nats
            log.info("nats-py not installed; using the built-in core-"
                     "protocol NATS client (url=%s)", url)
        from ..ingest import WarrenEvent, warren_event_to_node
        try:
            nc = await nats.connect(url)
        except Exception as e:  # noqa: BLE001
            log.warning("NATS connect failed (%s); continuing without "
                        "consumer", e)
            return
        try:
            sub = await nc.subscribe("warren.>")
            async for msg in sub.messages:
                try:
                    import json as _json
                    ev = WarrenEvent.from_json(_json.loads(msg.data))
                    node = warren_event_to_node(ev)
                    if node is not None:
                        await asyncio.to_thread(self.cortex.store, node,
                                                actor="warren")
                except Exception:
                    log.exception("warren event failed (continuing)")
        finally:
            # close on cancellation too, or the broker sees a zombie
            # connection for the rest of the process lifetime
            with contextlib.suppress(Exception):
                await asyncio.shield(asyncio.wait_for(nc.close(), 5.0))

    # ------------------------------------------------------------- shutdown
    async def stop(self) -> None:
        for t in self.tasks:
            t.cancel()
        for t in self.tasks:
            with contextlib.suppress(asyncio.CancelledError):
                await t
        self.tasks.clear()
        # join any in-flight linker/retention cycle thread: task
        # cancellation abandons the await, not the thread, and the
        # close-time snapshot below must observe a quiesced engine
        await asyncio.to_thread(self._cycle_executor.shutdown, True)
        if self.grpc_server is not None:
            # stop() returns a threading.Event; WAIT for it — otherwise
            # in-flight handlers on the gRPC thread pool keep running
            # while cortex/guard close underneath them and accepted
            # writes can miss the re-encrypted snapshot (ADVICE r1 #2)
            ev = self.grpc_server.stop(grace=2.0)
            await asyncio.to_thread(ev.wait)
        if self.http_runner is not None:
            await self.http_runner.cleanup()
        if self.state is not None and self.state.batcher is not None:
            await self.state.batcher.close()
        if self.state is not None and self.state.search_batcher is not None:
            await self.state.search_batcher.close()
        if getattr(self, "webhooks", None) is not None:
            self.webhooks.close()
        if self.cortex is not None:
            self.cortex.close()
        if self.guard is not None:
            self.guard.close()  # re-encrypt at rest (serve.rs:21-31)
        log.info("cortex stopped")


async def run_async(config: CortexConfig) -> None:
    """Boot, then block until SIGINT/SIGTERM (serve.rs ctrl_c)."""
    server = Server(config)
    try:
        await server.start()
        stop = asyncio.Event()
        loop = asyncio.get_running_loop()
        for sig in (signal.SIGINT, signal.SIGTERM):
            with contextlib.suppress(NotImplementedError):
                loop.add_signal_handler(sig, stop.set)
        await stop.wait()
    finally:
        # start() itself can fail AFTER open_embedded (port already
        # bound, plugin error): stop() must still run so the
        # encryption guard re-encrypts — a boot crash must never
        # strand the decrypted working copy on disk
        await server.stop()


def run(config: CortexConfig) -> None:
    asyncio.run(run_async(config))
