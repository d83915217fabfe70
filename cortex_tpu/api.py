"""Embedded Cortex: the library-mode top-level API.

Parity surface: crates/cortex-core/src/api.rs:38-213 (open / store /
search / get_node / list_nodes / create_edge / traverse / add_hook +
kind convenience constructors) — but unlike the reference's library mode,
hybrid search, briefings, the auto-linker, the write gate, retention and
the prompt subsystem are all wired here too: the server layer
(cortex_tpu.server) is a thin surface over this object.

Store/search run the TPU path: deterministic or model embeddings on the
host, device-resident index with fused cosine+top-k search.
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .briefing import (Briefing, BriefingConfig, BriefingEngine, GraphVersion)
from .config import CortexConfig
from .errors import GateRejection as GateRejectionError
from .gate import SchemaValidator, WriteGate
from .graph import (BOTH, DeviceGraphMirror, GraphEngine, PathRequest,
                    Subgraph, TraversalRequest)
from .hooks import HookRegistry, MutationHook
from .linker import AutoLinker
from .policies import AuditLog, RetentionEngine
from .prompt import PromptResolver, RollbackMonitor
from .query import parse_and_compile
from .storage import MemoryStorage, NodeFilter, SqliteStorage, Storage
from .types import Edge, EdgeProvenance, Node, Source
from .vector import (ScoreDecayConfig, TpuFlatIndex, VectorFilter,
                     apply_score_decay_batch, default_embedder)
from .vector.hybrid import HybridQuery, HybridResult, HybridSearch

#: incremental-checkpoint policy: live checkpoints append LINKS to a
#: delta CHAIN (each link holds only the rows touched since the
#: previous checkpoint — bounded, ~MBs) and the base npz is rewritten
#: only when the chain's total row count outgrows max(floor, corpus/4)
#: or the link count cap. The r2 design kept ONE cumulative delta,
#: rewritten in full every checkpoint: under sustained writes that is
#: O(T^2) total bytes, and the corpus/20 rewrite ceiling forced a full
#: base rewrite (~25-35 s of starved-host npz on this image) every
#: ~20 s in the IVF mixed-workload soak — the dominant residual p99.
_DELTA_FULL_REWRITE_FLOOR = 4096
#: chain ceiling as a corpus fraction (boot replays the whole chain;
#: replay is upsert_batch work, ~ms per link)
_CHAIN_ROW_DIVISOR = 4
#: hard cap on chain length (one file open per link at boot)
_CHAIN_MAX_LINKS = 64


class Cortex:
    """Embedded engine. `Cortex.open(path)` for durable SQLite-backed
    state; `Cortex.in_memory()` for tests/ephemeral use."""

    def __init__(self, storage: Storage, config: Optional[CortexConfig] = None):
        self.config = config or CortexConfig()
        self.storage = storage
        # held across every store-write + index-mutation pair AND by
        # the snapshot capture, so a snapshot can never record a
        # mutation sequence whose index update hasn't landed yet
        # (the mid-serve checkpoint would otherwise validate a
        # snapshot that is missing that node); created before any
        # component that shares it (the auto-linker and dedup scanner
        # mutate store+index from their own cycle thread)
        import threading
        self._persist_lock = threading.Lock()
        # bounded first-backend-touch BEFORE any real device work: on a
        # tunneled device a wedged transport blocks backend init forever
        # in native code (uninterruptible, zero log output) — fail
        # loudly instead (utils/device.py; no-op after first success).
        # Must precede the embedder too: device-encoder models
        # (flax:/converted HF) upload their params in __init__
        from .utils.device import preflight_device
        preflight_device()
        self.embedder = default_embedder(self.config.embedding.model,
                                         self.config.embedding.dimension)
        self.index = self._make_index()
        # delta-chain bookkeeping (see save_index_snapshot): the
        # on-disk base's seq this chain extends, link count, total
        # rows across links, and the last link's index_seq — set
        # BEFORE _rebuild_index, whose snapshot load initializes it
        self._chain_bs: Optional[int] = None
        self._chain_len = 0
        self._chain_ids = 0
        self._chain_last_seq: Optional[int] = None
        self._rebuild_index()
        self.graph = GraphEngine(storage)
        self.mirror = DeviceGraphMirror(self.graph.cache)
        self.graph_version = GraphVersion()
        self.hooks = HookRegistry()
        self.hybrid = HybridSearch(storage, self.embedder, self.index,
                                   self.mirror)
        self.briefing_engine = BriefingEngine(
            storage, self.graph, self.index, self.embedder, self.hybrid,
            self.graph_version, self.config.briefing)
        self.linker = AutoLinker(
            storage, self.index, self.embedder, self.config.auto_linker,
            persist_lock=self._persist_lock,
            on_index_pair_failure=self._index_pair_failed)
        self.retention = RetentionEngine(self.config.retention,
                                         self.config.score_decay)
        self.audit = AuditLog(storage)
        self.schema_validator = SchemaValidator(self.config.schemas)
        self.prompts = PromptResolver(storage)
        self.rollback_monitor = RollbackMonitor(storage,
                                                self.config.prompt_rollback)
        # classifier plugins: callables node -> Optional[str]
        self.classifiers: List = []
        # serializes gate-check + store across ALL surfaces (HTTP, gRPC,
        # library) so concurrent near-duplicates can't both pass the
        # conflict gate before either is stored
        import threading
        self.admission_lock = threading.Lock()
        # serializes whole snapshot saves: a checkpoint racing the
        # close-time save could otherwise pair the newest marker with
        # an older npz
        self._snapshot_lock = threading.Lock()

    # ------------------------------------------------------------------ boot
    @staticmethod
    def open(path: str, config: Optional[CortexConfig] = None, *,
             warmup: bool = False) -> "Cortex":
        """Open durable SQLite-backed state. warmup=True pre-compiles
        the hot device programs before returning (deadline-bounded —
        see Cortex.warmup): on a cold XLA cache or a slow/tunneled
        device the first store/search otherwise blocks for the compile
        with no feedback (VERDICT r2 #5)."""
        sync_mode = (config.server.sqlite_synchronous
                     if config is not None else "normal")
        cx = Cortex(SqliteStorage(path, synchronous=sync_mode), config)
        if warmup:
            cx.warmup()
        return cx

    @staticmethod
    def in_memory(config: Optional[CortexConfig] = None, *,
                  warmup: bool = False) -> "Cortex":
        cx = Cortex(MemoryStorage(), config)
        if warmup:
            cx.warmup()
        return cx

    def _warmup_body(self, progress) -> None:
        """Pre-compile the hot device programs (index insert/scatter,
        filtered + unfiltered search, serving batch buckets) — shared
        by serve-mode boot and library-mode warmup. XLA caches by
        shape process-wide, so a scratch corpus covers the generic
        programs and the real index covers serving capacities."""
        import time as _time
        from .vector import VectorFilter
        t0 = _time.monotonic()
        dim = self.embedder.dimension
        # same index class/config as the serving index (a sharded
        # deployment must warm the shard_map kernel, not the
        # single-device one)
        scratch = self._make_index()
        rng = np.random.default_rng(0)
        vecs = rng.normal(size=(8, dim)).astype(np.float32)
        scratch.insert_batch([f"w{i}" for i in range(8)], vecs,
                             kinds=["fact"] * 8, agents=["warm"] * 8)
        progress("warmup: scratch corpus built")
        scratch.search_batch(vecs[:1], 10)                    # plain (k=16)
        scratch.search_batch(vecs[:1], 5)                     # gate's k (8)
        scratch.search_batch(vecs[:1], 10,
                             VectorFilter(kinds=["fact"]))    # filtered
        scratch.insert("w9", vecs[0], kind="fact", source_agent="warm")
        scratch.search_batch(vecs[:1], 10)                    # scatter
        progress("warmup: scratch searches compiled")
        # warm the REAL index's programs too: the serving corpus
        # capacity differs from the scratch corpus. Batch buckets are
        # powers of two (the server's coalescer produces them; library
        # callers mostly search at B=1).
        if len(self.index) > 0:
            over = self.overfetch_k(10)           # the default search k
            bmax = 64
            qs = rng.normal(size=(bmax, dim)).astype(np.float32)
            b = 1
            while b <= bmax:
                self.index.search_batch(qs[:b], over)
                progress(f"warmup: serving bucket B={b} compiled")
                b *= 2
            self.index.search_batch(qs[:1], 10)               # no-decay k
            # warm the auto-linker's EXACT code paths, not just a
            # lookalike shape: its stream scan (chunk dispatch + the
            # device-side concat, whose op shape depends on the chunk
            # count) and the dedup scanner's candidate search (its own
            # B=256/k=64 bucket). Left cold, the first at-scale cycle
            # compiles these mid-serving — and on a tunneled device a
            # compile RPC head-of-line-blocks every serving dispatch
            # on the shared transport (measured: first-cycle search
            # 19.5 s / dedup 10.8 s while p95 spiked to 22 s; the
            # second cycle ran the same work in 1.8 s)
            nq = min(512, max(2, self.config.auto_linker
                              .max_nodes_per_cycle))
            lq = rng.normal(size=(nq, dim)).astype(np.float32)
            if hasattr(self.index, "search_stream"):
                self.index.search_stream(
                    lq, self.config.auto_linker.candidate_k, batch=128)
            else:
                self.index.search_batch(
                    lq[:128], self.config.auto_linker.candidate_k)
            progress(f"warmup: linker stream scan ({nq} queries) compiled")
            from .linker.dedup import _BATCH as _DD_B, _CAND_K as _DD_K
            dq = rng.normal(size=(min(_DD_B, nq), dim)).astype(np.float32)
            self.index.search_batch(dq, _DD_K)
            progress("warmup: dedup scan bucket compiled")
            # warm the incremental-scatter buckets at SERVING capacity:
            # dirty-row scatters pad to powers of two (_bucket_rows)
            # and each bucket's donating scatter is its own XLA
            # program. Left cold, the first write wave of each size
            # compiles mid-serving — the mixed-workload bench measured
            # multi-minute p99 search stalls from exactly this.
            # Re-scattering live rows with their current host-mirror
            # values is a semantic no-op. IVF corpora warm SHAPE-ONLY
            # instead: a real dirty pass there drops the rows' spill
            # copies (a real, if small, recall change — not a no-op).
            from .vector.ivf import IvfCorpus
            co = getattr(self.index, "_corpus", None)
            if isinstance(co, IvfCorpus):
                if co.warm_scatter_buckets():
                    progress("warmup: ivf scatter buckets compiled "
                             "(shape-only)")
                n_warm = co.warm_next_slot_programs()
                if n_warm:
                    progress(f"warmup: {n_warm} next-slot-rung ivf "
                             "programs compiled (shape-only)")
            elif co is not None:
                b = 1
                while b <= min(1024, co._cap):
                    with co._lock:
                        co._dirty.update(range(b))
                    co.sync()
                    progress(f"warmup: scatter bucket {b} compiled")
                    b *= 2
            # pre-compile the NEXT capacity-ladder growth programs
            # (shape-only AOT, no HBM): a mid-serving ladder crossing
            # otherwise pays its one-time pad compile on the live path
            if co is not None and co.warm_growth_programs():
                progress("warmup: next-ladder growth programs compiled")
        self.embedder.embed("warmup text")
        progress(f"device warmup done in {_time.monotonic() - t0:.1f}s")

    def warmup(self, *, deadline_s: Optional[float] = None,
               progress=None) -> bool:
        """Deadline-bounded device warmup with progress logging.

        Returns True when warmup completed; False when the deadline
        expired — the engine then serves with cold compile caches
        (first requests pay compile latency, protected by the fetch
        watchdog in vector.shard) and the abandoned thread's compiles
        still land in the XLA cache if they ever finish. Deadline
        defaults to CORTEX_WARMUP_TIMEOUT_S (600 s) — same knob as
        serve-mode boot."""
        import logging
        import os as _os
        import threading as _threading
        log_ = logging.getLogger("cortex.api")
        if progress is None:
            progress = log_.info
        if deadline_s is None:
            deadline_s = float(_os.environ.get(
                "CORTEX_WARMUP_TIMEOUT_S", "600"))
        done = _threading.Event()
        err: List[BaseException] = []

        def run():
            try:
                self._warmup_body(progress)
            except BaseException as e:  # noqa: BLE001
                err.append(e)
            finally:
                done.set()

        t = _threading.Thread(target=run, daemon=True,
                              name="cortex-warmup")
        t.start()
        if not done.wait(deadline_s):
            log_.warning(
                "device warmup exceeded its %.0fs deadline; continuing "
                "with cold compile caches (first requests will pay "
                "compile latency)", deadline_s)
            return False
        if err:
            log_.warning("device warmup failed (%r); continuing cold",
                         err[0])
            return False
        return True

    def _make_index(self):
        """TpuFlatIndex, or the mesh-sharded variant when configured
        and more than one device is visible."""
        if self.config.embedding.sharded:
            import jax
            if len(jax.devices()) > 1:
                from .parallel import build_mesh
                n = len(jax.devices())
                pow2 = 1 << (n.bit_length() - 1)   # largest power of two
                replicas = max(1, self.config.embedding.mesh_replicas)
                if (replicas & (replicas - 1)) != 0:
                    # programmatic configs may skip config.validate()
                    from .errors import ConfigError
                    raise ConfigError(
                        f"[embedding] mesh_replicas={replicas} must be "
                        f"a power of two")
                if replicas > 1 and pow2 // replicas < 1:
                    from .errors import ConfigError
                    raise ConfigError(
                        f"[embedding] mesh_replicas={replicas} leaves no "
                        f"shard devices on a {pow2}-device mesh (each "
                        f"replica group needs >= 1 device)")
                mesh = build_mesh(pow2, replicas=replicas)
                if self.config.embedding.index == "ivf":
                    from .parallel.sharded_ivf import ShardedIvfIndex
                    return ShardedIvfIndex(
                        self.embedder.dimension, mesh,
                        nlist=self.config.embedding.ivf_nlist,
                        nprobe=self.config.embedding.ivf_nprobe,
                        spill=self.config.embedding.ivf_spill,
                        graph_degree=(
                            self.config.embedding.ivf_graph_degree),
                        target_recall=(
                            self.config.embedding.ivf_target_recall),
                        search_path=self.config.embedding.search_path,
                        storage_dtype=self.config.embedding.device_dtype)
                from .parallel import ShardedFlatIndex
                return ShardedFlatIndex(
                    self.embedder.dimension, mesh,
                    search_path=self.config.embedding.search_path,
                    storage_dtype=self.config.embedding.device_dtype)
        if self.config.embedding.index == "ivf":
            from .vector.ivf import TpuIvfIndex
            return TpuIvfIndex(
                self.embedder.dimension,
                nlist=self.config.embedding.ivf_nlist,
                nprobe=self.config.embedding.ivf_nprobe,
                spill=self.config.embedding.ivf_spill,
                graph_degree=self.config.embedding.ivf_graph_degree,
                target_recall=self.config.embedding.ivf_target_recall,
                search_path=self.config.embedding.search_path,
                storage_dtype=self.config.embedding.device_dtype)
        return TpuFlatIndex(
            self.embedder.dimension,
            search_path=self.config.embedding.search_path,
            storage_dtype=self.config.embedding.device_dtype)

    def _rebuild_index(self) -> None:
        """Load the index snapshot sidecar when it matches the store's
        mutation sequence (skips decoding every stored embedding —
        minutes at 1M nodes); otherwise rebuild from stored embeddings
        (api.rs:54-69 / serve.rs:100-123 — the reference always takes
        the slow path)."""
        self._index_diverged = False
        # bumped per rebuild: a snapshot save whose write phase (runs
        # OUTSIDE the persist lock) straddles a rebuild must not
        # re-arm chain state for an index that no longer derives from
        # the base it just wrote (save_index_snapshot checks this)
        self._index_rebuild_gen = getattr(
            self, "_index_rebuild_gen", 0) + 1
        if self._try_load_index_snapshot():
            self._index_base_synced = True
            return
        # full rebuild: the in-memory state is now derived from STORAGE,
        # not from the on-disk base file — the delta working set tracks
        # changes vs nothing, so a delta checkpoint against that base
        # would be invalid (e.g. a node deleted between the base save
        # and the crash is absent here but present in the base; a
        # {base, delta} pair would resurrect it at the next boot)
        self._index_base_synced = False
        self._chain_bs = None                 # no chain over any base
        self._chain_len = 0
        self._chain_ids = 0
        self._chain_last_seq = None
        if len(self.index) > 0:
            # a PARTIALLY applied snapshot load (base loaded, delta
            # apply raised) left stale base rows — rebuilding on top
            # would keep vectors of since-hard-deleted nodes and the
            # next full-base checkpoint would certify the zombies;
            # 'any corruption -> full rebuild' means from EMPTY
            self.index = self._make_index()
        nodes = [n for n in self.storage.list_nodes(NodeFilter())
                 if n.embedding is not None
                 and len(n.embedding) == self.embedder.dimension]
        if nodes:
            self.index.insert_batch(
                [n.id for n in nodes],
                np.stack([np.asarray(n.embedding, np.float32)
                          for n in nodes]),
                kinds=[n.kind for n in nodes],
                agents=[n.source.agent for n in nodes])

    def _index_snapshot_path(self) -> Optional[str]:
        p = getattr(self.storage, "path", None)
        if (not p or p == ":memory:"
                or not self.config.embedding.snapshot_boot
                # never write a PLAINTEXT embedding sidecar next to an
                # encrypted-at-rest database — it would outlive the
                # re-encrypted working copy and leak content
                or self.config.security.encryption_at_rest):
            return None
        return p + ".index.npz"

    def _index_delta_path(self) -> Optional[str]:
        p = self._index_snapshot_path()
        return None if p is None else p + ".delta.npz"

    def _index_link_path(self, k: int) -> Optional[str]:
        """Chain link k's file: link 0 keeps the legacy single-delta
        name (old snapshots load as a one-link chain)."""
        p = self._index_snapshot_path()
        if p is None:
            return None
        return p + (".delta.npz" if k == 0 else f".delta.{k}.npz")

    def _delete_chain_links(self, from_k: int = 0) -> None:
        """Remove link files >= from_k (stale after a base rewrite, or
        left behind by a storage restore to an older seq — a stale
        higher link could otherwise pair with a fresh chain whose
        monotonic seqs re-issue the discarded range)."""
        import os as _os
        k = from_k
        while True:
            lp = self._index_link_path(k)
            if lp is None or not _os.path.exists(lp):
                # also probe one past a gap (crash between deletes)
                lp2 = self._index_link_path(k + 1)
                if lp2 is None or not _os.path.exists(lp2):
                    return
            else:
                try:
                    _os.remove(lp)
                except OSError:
                    return
            k += 1

    def _try_load_index_snapshot(self) -> bool:
        """Boot from base snapshot (+ the incremental delta CHAIN when
        links are published): valid iff the base's seq, extended link
        by link (each link's base_seq must name this base and its
        prev_seq must equal the running seq), reaches exactly the
        storage's index_seq. Anything else (torn writes, stale pairs,
        chain gaps) -> full rebuild. Legacy single cumulative deltas
        (no prev_seq) load as a one-link chain."""
        import json as _json
        import os as _os
        path = self._index_snapshot_path()
        if path is None or not _os.path.exists(path) \
                or not _os.path.exists(path + ".meta"):
            return False
        seq = self.storage.index_seq()
        if seq is None:
            return False
        try:
            with open(path + ".meta") as f:
                meta = _json.load(f)
            if meta.get("dim") != self.embedder.dimension:
                return False
            base_seq = meta.get("index_seq")
            # walk the chain on metadata only (cheap: np.load is lazy)
            links, cur = [], base_seq
            for k in range(_CHAIN_MAX_LINKS):
                if cur == seq:
                    break   # storage reached; later links are stale
                    # debris (e.g. a restore to an older seq) — the
                    # next link write overwrites/deletes them
                lp = self._index_link_path(k)
                if lp is None or not _os.path.exists(lp):
                    break
                lmeta = self.index.read_delta_meta(lp)
                if (lmeta.get("dim") != self.embedder.dimension
                        or lmeta.get("base_seq") != base_seq
                        or lmeta.get("prev_seq", base_seq) != cur):
                    break                     # stale/foreign link
                links.append(lp)
                cur = lmeta.get("index_seq")
            if cur != seq:
                return False
            self.index.load(path)
            n_rows = 0
            for lp in links:
                lmeta = self.index.apply_delta(lp)
                n_rows += len(lmeta["ids"]) + len(lmeta["removed"])
            # the in-memory state now equals base + chain EXACTLY, so
            # the next link's working set starts empty (apply_delta
            # seeded it for the legacy cumulative design)
            if hasattr(self.index, "_delta_ids"):
                self.index._delta_ids.clear()
            self._chain_bs = base_seq
            self._chain_len = len(links)
            self._chain_ids = n_rows
            self._chain_last_seq = cur
            return True
        except Exception:  # noqa: BLE001 — any corruption -> full rebuild
            return False

    def save_index_snapshot(self, *, min_delta: int = 0) -> None:
        """Write the snapshot sidecar + its validity marker. Safe both
        at clean close and as a live checkpoint: seq capture and the
        index state read happen under the persist lock, so the marker
        can never record a mutation whose index update hasn't landed
        (a racing write completes either before both or after both —
        the after case makes the marker stale, and stale means
        rebuild, never a silently incomplete index).

        min_delta: skip the save unless at least this many index
        mutations accumulated since the last snapshot — live
        checkpoints pass embedding.snapshot_min_delta so a single
        mutation doesn't recopy and rewrite a million-row corpus
        every linker cycle; close() passes 0 (always save changes)."""
        import json as _json
        import logging as _logging
        import os as _os
        path = self._index_snapshot_path()
        if path is None:
            return
        if getattr(self, "_index_diverged", False):
            # a store+index pair half-failed earlier: the in-memory
            # index diverges from storage at a bumped seq — certifying
            # THIS state would make the missing row unsearchable across
            # every future boot. Skip until a rebuild converges.
            _logging.getLogger("cortex.api").warning(
                "index snapshot skipped: index diverged from storage "
                "after a failed store+index pair (rebuild to recover)")
            return
        dpath = self._index_delta_path()
        with self._snapshot_lock:       # one save at a time, start to end
            with self._persist_lock:
                seq = self.storage.index_seq()
                if seq is None:
                    return
                # the last-published seq is the chain tail's when this
                # process owns a chain over the on-disk base, else the
                # base marker's
                base_seq, saved = None, None
                if _os.path.exists(path + ".meta"):
                    try:
                        with open(path + ".meta") as f:
                            base_meta = _json.load(f)
                        if base_meta.get("dim") == self.embedder.dimension:
                            base_seq = base_meta.get("index_seq")
                            saved = base_seq
                    except Exception:  # noqa: BLE001
                        base_seq = saved = None
                if (base_seq is not None and self._chain_bs == base_seq
                        and self._chain_last_seq is not None):
                    saved = self._chain_last_seq
                if saved == seq:
                    return  # unchanged since last checkpoint
                if (isinstance(saved, int) and seq - saved < min_delta):
                    return  # too few changes for a live checkpoint
                # incremental checkpoint while a base exists: append a
                # LINK holding only the rows touched since the previous
                # checkpoint (bounded, ~MBs — a cumulative delta is
                # O(T^2) bytes under sustained writes) and rewrite the
                # base only when the whole chain outgrows a corpus
                # fraction or the link cap (a 3 GB npz rewrite pegs a
                # core for ~40 s — measured as p95 == write duration in
                # the 1M mixed-workload bench)
                use_delta = (
                    base_seq is not None and dpath is not None
                    # the in-memory index must actually DERIVE from the
                    # on-disk base (snapshot-boot or a prior base save
                    # this process) — after a full rebuild the delta
                    # working set is relative to storage, not the base,
                    # and pairing it with the stale base resurrects
                    # rows deleted since that base was written
                    and getattr(self, "_index_base_synced", False)
                    # ... and this process's chain must extend THIS base
                    and self._chain_bs == base_seq
                    and hasattr(self.index, "delta_size")
                    and self._chain_len < _CHAIN_MAX_LINKS
                    and (self._chain_ids + self.index.delta_size()
                         <= max(_DELTA_FULL_REWRITE_FLOOR,
                                len(self.index) // _CHAIN_ROW_DIVISOR))
                    # an IVF base written before training carries no
                    # clustering — rewrite it once so boots skip the
                    # k-means retrain (~90 s at 10M rows)
                    and not getattr(self.index, "snapshot_base_stale",
                                    lambda: False)())
                pending = None
                gen = getattr(self, "_index_rebuild_gen", 0)
                try:
                    # fast consistent copy under the lock; the slow
                    # write happens after release so writes don't stall
                    # for the checkpoint duration. Both paths swap the
                    # delta working set: each link holds only the rows
                    # touched since the previous checkpoint
                    if use_delta:
                        st = self.index.delta_state()
                    else:
                        st = self.index.snapshot_state()
                    pending = self.index.begin_snapshot_base()
                except Exception:  # noqa: BLE001 — an optimization only
                    _logging.getLogger("cortex.api").exception(
                        "index snapshot capture failed; live "
                        "checkpointing degraded (next boot rebuilds)")
                    return
            try:
                # atomic publication: tmp + rename, npz before marker —
                # a crash mid-save leaves a previous consistent state
                # or a mismatched/short chain (boot then rebuilds),
                # never a marker pointing at torn data
                if use_delta:
                    lpath = self._index_link_path(self._chain_len)
                    prev = (self._chain_last_seq if self._chain_len
                            else base_seq)
                    self.index.write_delta(
                        lpath + ".tmp", st,
                        extra_meta={"base_seq": base_seq,
                                    "prev_seq": prev,
                                    "index_seq": seq})
                    # stale higher links (crash debris, or a storage
                    # RESTORE to an older seq whose re-issued monotonic
                    # seqs could make an old link pair with this fresh
                    # tail) must be gone before the tail is published
                    self._delete_chain_links(self._chain_len + 1)
                    # np.savez appends .npz to paths without the suffix
                    _os.replace(lpath + ".tmp.npz", lpath)
                    with self._persist_lock:
                        # a reindex/rebuild that landed during the
                        # (unlocked) write invalidated this chain —
                        # leave the rebuild's reset state alone; the
                        # orphan link dies at the next base rewrite
                        if getattr(self, "_index_rebuild_gen", 0) == gen:
                            self._chain_len += 1
                            self._chain_ids += (len(st["ids"])
                                                + len(st["removed"]))
                            self._chain_last_seq = seq
                else:
                    self.index.write_snapshot(path + ".tmp.npz", st)
                    _os.replace(path + ".tmp.npz", path)
                    tmp_meta = path + ".meta.tmp"
                    with open(tmp_meta, "w") as f:
                        _json.dump({"index_seq": seq,
                                    "dim": self.embedder.dimension}, f)
                    _os.replace(tmp_meta, path + ".meta")
                    self._delete_chain_links(0)  # stale: old base
                    with self._persist_lock:
                        # same rebuild-straddle guard: the rebuilt
                        # index does not derive from the base this
                        # save just wrote, so re-arming the chain
                        # would let a later link resurrect rows
                        # deleted between the capture and the rebuild
                        if getattr(self, "_index_rebuild_gen", 0) == gen:
                            # the new base IS the current state
                            # (modulo the swapped working set): links
                            # may chain again
                            self._index_base_synced = True
                            self._chain_bs = seq
                            self._chain_len = 0
                            self._chain_ids = 0
                            self._chain_last_seq = seq
            except Exception:  # noqa: BLE001
                _logging.getLogger("cortex.api").exception(
                    "index snapshot write failed (disk full/permission?)"
                    "; next boot takes the full-rebuild path")
                if pending is not None:
                    self.index.abort_snapshot_base(pending)

    def close(self) -> None:
        self.save_index_snapshot()
        self.storage.close()

    # ------------------------------------------------------------ mutation
    def _apply_classifiers(self, node: Node) -> None:
        """classifier plugins enrich metadata; faults never block writes."""
        for clf in self.classifiers:
            try:
                label = clf(node)
                if label:
                    node.metadata.setdefault("classification", label)
            except Exception:  # noqa: BLE001
                pass

    def _on_write(self) -> None:
        self.graph.invalidate()
        self.graph_version.bump()

    def store(self, node: Node, *, gate: bool = False,
              skip_quality: bool = False, actor: str = "library") -> str:
        """Embed + persist + index + fire hooks (api.rs:99-114). With
        gate=True the 4-check write gate runs first and raises
        GateRejection on failure."""
        self._apply_classifiers(node)
        if node.embedding is None:
            node.embedding = self.embedder.embed_node(node).tolist()
        if gate:
            # gate + persist under the admission lock so concurrent
            # near-duplicates see each other; hooks fire AFTER release —
            # a hook performing its own gated store must not deadlock
            # on this non-reentrant lock
            with self.admission_lock:
                rej = WriteGate.check_all(
                    node, np.asarray(node.embedding, np.float32),
                    self.index, self.storage, self.config.write_gate,
                    self.schema_validator, skip_quality=skip_quality)
                if rej is not None:
                    raise GateRejectionError(
                        rej.check, rej.reason, rej.suggestion,
                        existing_node=rej.existing_node,
                        existing_title=rej.existing_title)
                is_update = self._persist(node, actor)
        else:
            is_update = self._persist(node, actor)
        self.hooks.notify_node("updated" if is_update else "created", node)
        return node.id

    def _index_pair_failed(self) -> None:
        """The storage half of a store+index pair committed but the
        index half raised: the in-memory index now diverges from
        storage at a seq the trigger already bumped. A checkpoint
        written from this state would CERTIFY the divergence (marker
        seq matches, node forever unsearchable across boots) — poison
        the snapshot machinery until a rebuild converges."""
        import logging
        self._index_diverged = True
        self._index_base_synced = False
        logging.getLogger("cortex.api").exception(
            "index mutation failed after its storage write committed; "
            "index snapshots disabled until the next full rebuild "
            "(reboot rebuilds from storage and recovers the row)")

    def _persist(self, node: Node, actor: str) -> bool:
        """Store + index + version bump (no hooks). Returns is_update."""
        with self._persist_lock:
            is_update = self.storage.get_node(node.id) is not None
            self.storage.put_node(node, actor=actor)
            try:
                self.index.insert(node.id,
                                  np.asarray(node.embedding, np.float32),
                                  kind=node.kind,
                                  source_agent=node.source.agent)
            except BaseException:
                self._index_pair_failed()
                raise
        self._on_write()
        return is_update

    def store_batch(self, nodes: Sequence[Node], *,
                    actor: str = "library") -> List[str]:
        """Batch admission: one embed_batch + one device upload — the
        idiomatic TPU ingest path (SURVEY §3.2 consequence)."""
        if not nodes:
            return []
        for n in nodes:
            self._apply_classifiers(n)
        missing = [n for n in nodes if n.embedding is None]
        if missing:
            embs = self.embedder.embed_nodes(missing)
            for j, n in enumerate(missing):
                n.embedding = embs[j].tolist()
        with self._persist_lock:
            self.storage.put_nodes_batch(nodes, actor=actor)
            try:
                self.index.insert_batch(
                    [n.id for n in nodes],
                    np.stack([np.asarray(n.embedding, np.float32)
                              for n in nodes]),
                    kinds=[n.kind for n in nodes],
                    agents=[n.source.agent for n in nodes])
            except BaseException:
                self._index_pair_failed()
                raise
        self._on_write()
        for n in nodes:
            self.hooks.notify_node("created", n)
        return [n.id for n in nodes]

    def bulk_import(self, nodes: Sequence[Node], *,
                    edges: Sequence = (),
                    actor: str = "bulk-import",
                    batch: int = 100_000,
                    advance_linker_cursor: bool = True) -> dict:
        """Bulk-load path (VERDICT r4 #3; ref: `cortex import`,
        cli/import.rs:91-186): bypasses the write gate, classifiers,
        and mutation hooks; embeds missing vectors in large batches;
        persists through the storage bulk path (executemany
        transactions — additive, existing ids untouched); uploads
        embeddings via index.insert_batch; loads edges raw WITHOUT
        endpoint validation (import files are self-consistent).

        advance_linker_cursor=True marks the imported rows as already
        processed so the auto-linker doesn't re-embed/re-link a
        10M-row backlog over the following hours; pass False to let
        imported nodes flow through normal link discovery.

        Returns {"nodes": inserted, "edges": inserted}."""
        nodes = list(nodes)
        n_inserted = 0
        for s in range(0, len(nodes), batch):
            chunk = nodes[s:s + batch]
            # additive contract applies to the INDEX too: storage's
            # INSERT OR IGNORE skips existing ids, so upserting their
            # vectors would leave the index describing content storage
            # never accepted (review r5 #1 — verified divergence)
            present = self.storage.existing_node_ids(
                [n.id for n in chunk])
            fresh = [n for n in chunk if n.id not in present]
            if not fresh:
                continue
            missing = [n for n in fresh if n.embedding is None]
            for ms in range(0, len(missing), 4096):
                mc = missing[ms:ms + 4096]
                embs = self.embedder.embed_nodes(mc)
                for j, n in enumerate(mc):
                    n.embedding = embs[j].tolist()
            with self._persist_lock:
                n_inserted += self.storage.bulk_put_nodes(fresh,
                                                          actor=actor)
                try:
                    self.index.insert_batch(
                        [n.id for n in fresh],
                        np.stack([np.asarray(n.embedding, np.float32)
                                  for n in fresh]),
                        kinds=[n.kind for n in fresh],
                        agents=[n.source.agent for n in fresh])
                except BaseException:
                    self._index_pair_failed()
                    raise
        e_inserted = 0
        edges = list(edges)
        for s in range(0, len(edges), batch):
            e_inserted += self.storage.bulk_put_edges(edges[s:s + batch],
                                                      actor=actor)
        if advance_linker_cursor and nodes:
            top = max(nodes, key=lambda n: (n.created_at, n.id))
            # the LIVE linker's in-memory cursor, not just the stored
            # metadata — on a running server the next cycle would
            # otherwise scan from the stale in-memory cursor and then
            # _save_state would clobber the advanced one (review r5 #2)
            self.linker.advance_cursor(top.created_at, top.id)
        self._on_write()
        return {"nodes": n_inserted, "edges": e_inserted}

    def update_node(self, node: Node, *, actor: str = "library") -> None:
        """Re-embed on update (grpc service.rs:170+ behavior)."""
        node.embedding = self.embedder.embed_node(node).tolist()
        node.updated_at = time.time()
        with self._persist_lock:
            self.storage.put_node(node, actor=actor)
            try:
                self.index.insert(node.id,
                                  np.asarray(node.embedding, np.float32),
                                  kind=node.kind,
                                  source_agent=node.source.agent)
            except BaseException:
                self._index_pair_failed()
                raise
        self._on_write()
        self.hooks.notify_node("updated", node)

    def delete_node(self, node_id: str, *, hard: bool = False,
                    actor: str = "library") -> bool:
        node = self.storage.get_node(node_id)
        if node is None:
            return False
        with self._persist_lock:
            ok = (self.storage.hard_delete_node(node_id, actor=actor)
                  if hard else
                  self.storage.delete_node(node_id, actor=actor))
            if ok:
                try:
                    self.index.remove(node_id)
                except BaseException:
                    self._index_pair_failed()
                    raise
        if ok:
            self._on_write()
            self.hooks.notify_node("deleted", node)
        return ok

    def create_edge(self, edge: Edge, *, actor: str = "library") -> str:
        self.storage.put_edge(edge, actor=actor)
        self._on_write()
        self.hooks.notify_edge("created", edge)
        return edge.id

    def delete_edge(self, edge_id: str, *, actor: str = "library") -> bool:
        edge = self.storage.get_edge(edge_id)
        ok = self.storage.delete_edge(edge_id, actor=actor)
        if ok and edge is not None:
            self._on_write()
            self.hooks.notify_edge("deleted", edge)
        return ok

    def add_hook(self, hook: MutationHook) -> None:
        self.hooks.add(hook)

    # --------------------------------------------------------------- queries
    def get_node(self, node_id: str) -> Optional[Node]:
        return self.storage.get_node(node_id)

    def list_nodes(self, f: Optional[NodeFilter] = None) -> List[Node]:
        return self.storage.list_nodes(f)

    def query(self, dsl: str) -> List[Node]:
        """Query-DSL filtered listing."""
        return self.storage.list_nodes(parse_and_compile(dsl))

    def overfetch_k(self, limit: int, decay: bool = True) -> int:
        """Candidate count for the device scan before the decay
        re-rank (routes.rs:900-904: (limit*3).max(30) when decay on)."""
        if decay and self.config.score_decay.enabled:
            return max(limit * 3, 30)
        return limit

    def search(self, query: str, limit: int = 10, *,
               flt: Optional[VectorFilter] = None,
               decay: bool = True,
               recency_bias: Optional[float] = None,
               record_access: bool = True) -> List[Tuple[float, Node]]:
        """Device search + vectorized score-decay re-rank (the reference
        search hot path, http/routes.rs:887-988, collapsed to one device
        round-trip + one batch re-rank)."""
        emb = self.embedder.embed(query)
        hits = self.index.search(emb, self.overfetch_k(limit, decay), flt)
        return self.finish_search(hits, limit, decay=decay,
                                  recency_bias=recency_bias,
                                  record_access=record_access)

    def finish_search(self, hits, limit: int = 10, *,
                      decay: bool = True,
                      recency_bias: Optional[float] = None,
                      record_access: bool = True
                      ) -> List[Tuple[float, Node]]:
        """Hydrate + decay-re-rank already-retrieved (node_id, score)
        hits — the host tail of `search`, shared with the server's
        read-side batcher (concurrent queries share one device scan,
        then each request finishes here with its own limit/decay)."""
        cfg = self.config.score_decay
        nodes, raw = [], []
        fetched = self.storage.get_nodes([nid for nid, _ in hits])
        for nid, score in hits:
            n = fetched.get(nid)
            if n is None or n.deleted:
                continue
            nodes.append(n)
            raw.append(score)
        if decay:
            final = apply_score_decay_batch(
                cfg, np.asarray(raw, np.float32), nodes, now=time.time(),
                recency_bias=recency_bias)
        else:
            final = np.asarray(raw, np.float32)
        order = np.argsort(-final, kind="stable")[:limit]
        out = [(float(final[i]), nodes[i]) for i in order]
        if record_access:
            bump = []
            for _, n in out:
                if self.linker.decay_engine.should_reinforce(n):
                    # echo: reset the decay clock on the node's edges,
                    # throttled to once per access_reinforcement_days
                    # (decay.rs:104-135; bumps access_count on `n` too
                    # so the returned object matches what's persisted)
                    self.linker.decay_engine.reinforce(n.id, node=n)
                else:
                    bump.append(n)
            if bump:
                # one guarded UPDATE for all plain bumps (was a commit
                # per returned node — up to `limit` fsyncs per search);
                # the write-back keeps returned copies in sync without
                # blind put_node resurrection (the r1 soak flake)
                applied = self.storage.record_access_batch(
                    [n.id for n in bump])
                for n in bump:
                    got = applied.get(n.id)
                    if got is not None:
                        n.access_count, n.last_accessed_at = got
        return out

    def search_hybrid(self, query: str, anchors: Sequence[str] = (),
                      limit: int = 10, *,
                      vector_weight: float = 0.7,
                      kind_filter: Optional[List[str]] = None,
                      max_anchor_depth: int = 3) -> List[HybridResult]:
        return self.hybrid.search(HybridQuery(
            query_text=query, anchors=list(anchors),
            vector_weight=vector_weight, limit=limit,
            kind_filter=kind_filter, max_anchor_depth=max_anchor_depth))

    def traverse(self, req: TraversalRequest) -> Subgraph:
        return self.graph.traverse(req)

    def neighborhood(self, node_id: str, depth: int = 1,
                     direction=BOTH) -> Subgraph:
        return self.graph.traverse(TraversalRequest(
            start=[node_id], max_depth=depth, direction=direction))

    def find_paths(self, req: PathRequest):
        return self.graph.find_paths(req)

    def briefing(self, agent_id: str, *, compact: bool = False) -> str:
        b = self.briefing_engine.generate(agent_id)
        return self.briefing_engine.render(b, compact=compact)

    def briefing_full(self, agent_id: str) -> Briefing:
        return self.briefing_engine.generate(agent_id)

    def stats(self):
        return self.storage.stats()

    # ------------------------------------------------------------ background
    def run_linker_cycle(self):
        m = self.linker.run_cycle()
        self._on_write()
        return m

    def run_retention(self) -> Tuple[int, int]:
        """Retention deletions pair the store write with the index
        removal under the persist lock — previously the sweep bypassed
        the live index, so swept nodes kept answering searches (and
        blocking the gate's conflict check) until the next restart, and
        a snapshot checkpoint would have made that divergence survive
        restarts too."""
        def soft(nid: str) -> bool:
            with self._persist_lock:
                ok = self.storage.delete_node(nid, actor="retention")
                if ok:
                    self.index.remove(nid)
            return ok

        def hard(nid: str) -> bool:
            with self._persist_lock:
                ok = self.storage.hard_delete_node(nid, actor="retention")
                if ok:
                    self.index.remove(nid)
            return ok

        swept = self.retention.sweep(self.storage, deleter=soft)
        purged = self.retention.purge_expired(self.storage, deleter=hard)
        if swept or purged:
            self._on_write()
        return swept, purged

    def reindex(self) -> int:
        """Re-embed every live node (gRPC Reindex after model change).
        Runs under the admission lock: a write landing between the node
        snapshot and the index swap would otherwise vanish from the new
        index until the next restart."""
        with self.admission_lock:
            nodes = self.storage.list_nodes(NodeFilter())
            if not nodes:
                return 0
            embs = self.embedder.embed_nodes(nodes)
            for j, n in enumerate(nodes):
                n.embedding = embs[j].tolist()
            # persist lock across the store write AND the index swap: a
            # snapshot checkpoint between them would certify the
            # old-embedding index at the new mutation sequence, and the
            # seq-equality early-return would then pin it forever
            with self._persist_lock:
                self.storage.put_nodes_batch(nodes)
                self.index = self._make_index()
                self._rebuild_index()
            self.hybrid.index = self.index
            self.briefing_engine.index = self.index
            self.linker.index = self.index
            self._on_write()
            return len(nodes)

    # --------------------------------------------- convenience constructors
    @staticmethod
    def _make(kind: str, title: str, body: str, importance: float) -> Node:
        return Node.new(kind, title, body, Source(agent="library"),
                        importance)

    @staticmethod
    def fact(title: str, importance: float = 0.5) -> Node:
        return Cortex._make("fact", title, title, importance)

    @staticmethod
    def decision(title: str, body: str, importance: float = 0.5) -> Node:
        return Cortex._make("decision", title, body, importance)

    @staticmethod
    def event(title: str, body: str, importance: float = 0.5) -> Node:
        return Cortex._make("event", title, body, importance)

    @staticmethod
    def goal(title: str, body: str, importance: float = 0.5) -> Node:
        return Cortex._make("goal", title, body, importance)

    @staticmethod
    def observation(title: str, body: str, importance: float = 0.5) -> Node:
        return Cortex._make("observation", title, body, importance)

    @staticmethod
    def pattern(title: str, body: str, importance: float = 0.5) -> Node:
        return Cortex._make("pattern", title, body, importance)

    @staticmethod
    def preference(title: str, body: str, importance: float = 0.5) -> Node:
        return Cortex._make("preference", title, body, importance)

    @staticmethod
    def agent(title: str, body: str, importance: float = 0.8) -> Node:
        return Cortex._make("agent", title, body, importance)


def configure_compilation_cache(config: CortexConfig) -> None:
    """Enable jax's persistent compilation cache per
    [server] compilation_cache_dir (relative paths resolve under
    data_dir; "" disables). An operator-set JAX_COMPILATION_CACHE_DIR
    env var takes precedence — the standard JAX mechanism (e.g. a
    shared multi-host cache volume) must not be silently overridden
    by the cortex default. Safe to call repeatedly; must run before
    the first device compile to matter."""
    import os
    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return
    cache_dir = config.server.compilation_cache_dir
    if not cache_dir:
        return
    if not os.path.isabs(cache_dir):
        cache_dir = os.path.join(config.server.data_dir, cache_dir)
    import jax
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def open_embedded(config: CortexConfig):
    """Open the engine on config's data dir, honoring
    security.encryption_at_rest the same way the server does
    (serve.rs:57-81): decrypt-to-temp on open, re-encrypt when the
    returned guard closes. Returns (cortex, guard-or-None); callers
    must close BOTH (cortex first)."""
    import os
    from .storage.encrypted import EncryptedDbGuard, derive_key

    configure_compilation_cache(config)

    os.makedirs(config.server.data_dir, exist_ok=True)
    db_path = os.path.join(config.server.data_dir, "cortex.db")
    guard = None
    if config.security.encryption_at_rest:
        guard = EncryptedDbGuard(db_path + ".enc", derive_key())
        db_path = guard.plain_path
    try:
        return Cortex.open(db_path, config), guard
    except BaseException:
        if guard is not None:
            guard.close()   # never leave plaintext behind on a failed open
        raise
