"""Edge decay engine — device-vectorized sweep.

Behavioral parity with crates/cortex-core/src/linker/decay.rs:21-157
(exponential decay with importance shielding, manual exemption, delete
below threshold, prune counting, reinforce-on-access), but the per-edge
loop becomes ONE fused array op (cortex_tpu.ops.decay.decay_sweep) over
packed [E] arrays — the O(E) sweep the BASELINE targets at 10M+ edges.
Host applies the results (weight writes / deletions) in batch.
"""

from __future__ import annotations

import json
import os
import time
from typing import List, Tuple

import jax.numpy as jnp
import numpy as np

from ..ops.decay import (decay_sweep, decay_sweep_host,
                         use_device_sweep)
from ..storage.base import Storage
from .config import DecayConfig


class DecayEngine:
    def __init__(self, storage: Storage, config: DecayConfig):
        self.storage = storage
        self.config = config

    #: scan/persist unit: bounds both peak host memory (a few hundred
    #: MB of ids per chunk at UUID sizes) and the storage-lock hold
    #: time of each bulk-apply transaction (~2-4 s at 1M updates), so
    #: concurrent searches interleave with the persist instead of
    #: stalling behind one 20M-row transaction
    CHUNK = 1_000_000

    def _sweep_arrays(self, weights, days, max_imp, exempt):
        """Run the decay kernel over one chunk's packed arrays.
        Device for big chunks (padded to pow2 buckets so at most
        ~5 compiled shapes ever exist) WHEN the measured link
        bandwidth beats the host pass — sweep inputs originate on
        the host every sweep, so a tunneled device pays 26 B/edge of
        transfer for an op numpy does at ~100M edges/s
        (ops.decay.use_device_sweep); vectorized host otherwise."""
        n = len(weights)
        if not use_device_sweep(n):
            return decay_sweep_host(
                weights, days, max_imp, exempt,
                self.config.daily_decay_rate,
                self.config.importance_shield,
                self.config.delete_threshold,
                self.config.prune_threshold)
        bucket = 1 << (n - 1).bit_length()
        pad = bucket - n
        if pad:
            weights = np.pad(weights, (0, pad), constant_values=1.0)
            days = np.pad(days, (0, pad))
            max_imp = np.pad(max_imp, (0, pad))
            exempt = np.pad(exempt, (0, pad), constant_values=True)
        new_w, delete, prune, changed = decay_sweep(
            jnp.asarray(weights), jnp.asarray(days),
            jnp.asarray(max_imp), jnp.asarray(exempt),
            jnp.float32(self.config.daily_decay_rate),
            jnp.float32(self.config.importance_shield),
            jnp.float32(self.config.delete_threshold),
            jnp.float32(self.config.prune_threshold))
        # watchdogged fetches: a lost remote-device response fails
        # this sweep (the linker loop logs and retries next cycle)
        # instead of hanging the background task forever
        from ..vector import fetch_array as _fetch_array
        return (_fetch_array(new_w)[:n], _fetch_array(delete)[:n],
                _fetch_array(prune)[:n], _fetch_array(changed)[:n])

    def apply_decay(self, now: float | None = None) -> Tuple[int, int]:
        """Sweep all edges. Returns (pruned_count, deleted_count).

        Pipeline per chunk: columnar storage scan (no Edge objects) →
        fused device/host sweep → ONE bulk-apply transaction
        (storage.apply_decay_results). The r4 shape — full object
        materialization feeding per-edge autocommit writes — took
        934 s to persist one sweep at 20.8M edges; this persists the
        same sweep in executemany transactions (ref contrast: the
        reference batches writes inside one redb txn,
        linker/decay.rs:21-101)."""
        now = time.time() if now is None else now
        deleted_count = 0
        pruned_count = 0
        for ids, weights, updated_at, max_imp, manual in \
                self.storage.decay_scan(chunk=self.CHUNK):
            days = ((now - updated_at) / 86400.0).astype(np.float32)
            exempt = manual if self.config.exempt_manual \
                else np.zeros_like(manual)
            new_w, delete, prune, changed = self._sweep_arrays(
                weights, days, max_imp, exempt)
            upd_mask = changed & ~delete
            updates = [(ids[i], float(new_w[i]))
                       for i in np.flatnonzero(upd_mask)]
            deletes = [ids[i] for i in np.flatnonzero(delete)]
            _, ndel = self.storage.apply_decay_results(
                updates, deletes, actor="decay")
            deleted_count += ndel
            pruned_count += int(np.count_nonzero(prune & upd_mask))
        return pruned_count, deleted_count

    def apply_decay_isolated(self, db_path: str,
                             now: float | None = None, *,
                             timeout_s: float = 3600.0
                             ) -> Tuple[int, int]:
        """Run ONE full sweep in a separate OS process
        (linker/decay_worker.py) against the same sqlite file —
        maintenance isolation: in-process, the sweep's minutes of
        CPU-bound work convoys the serving event loop through the GIL
        (measured: a 296 s sweep at 20.8M edges admitted 23 HTTP
        searches in a 60 s window on 1 vCPU); a separate process gets
        fair OS scheduling, and a spare core on real hosts. WAL +
        busy_timeout make the cross-process writes safe; the sweep's
        write shapes (weight UPDATE / DELETE by id / audit append)
        need no in-process lock invariants. Raises on worker failure
        or timeout — callers fall back inline or retry next cycle."""
        import dataclasses
        import subprocess
        import sys as _sys

        import cortex_tpu as _pkg
        cfg_json = json.dumps(dataclasses.asdict(self.config))
        env = dict(os.environ)
        pkg_root = os.path.dirname(os.path.dirname(
            os.path.abspath(_pkg.__file__)))
        env["PYTHONPATH"] = pkg_root + os.pathsep + \
            env.get("PYTHONPATH", "")
        argv = [_sys.executable, "-m",
                "cortex_tpu.linker.decay_worker", db_path, cfg_json]
        if now is not None:
            argv.append(repr(float(now)))
        proc = subprocess.run(argv, capture_output=True, text=True,
                              timeout=timeout_s, env=env)
        if proc.returncode != 0:
            raise RuntimeError(
                f"decay worker rc={proc.returncode}: "
                f"{proc.stderr.strip()[-500:]}")
        out = json.loads(proc.stdout.strip().splitlines()[-1])
        if "error" in out:
            raise RuntimeError(f"decay worker: {out['error']}")
        return int(out["pruned"]), int(out["deleted"])

    REINFORCED_AT_KEY = "_last_reinforced_at"

    def reinforce(self, node_id: str, node=None) -> int:
        """Reset the decay timer on all edges of an accessed node and bump
        its access count (decay.rs:104-135). Called from the search
        access-recording path, throttled by access_reinforcement_days
        (a node reinforces its edges at most once per window). Pass the
        in-memory `node` when the caller holds one so its fields stay in
        sync with what gets persisted."""
        now = time.time()
        edges = self.storage.edges_from(node_id) + self.storage.edges_to(node_id)
        for e in edges:
            # weight unchanged; updated_at reset restarts the decay window
            self.storage.update_edge_weight_atomic(e.id, e.weight, touch=True)
        # atomic conditional bump — a stale put_node here could
        # resurrect a node deleted since the caller read it
        applied = self.storage.record_access(node_id, now=now,
                                             reinforced_at=now)
        if applied and node is not None:
            # sync the caller's copy from what actually landed (field
            # assignment, not increment: MemoryStorage aliases stored
            # objects, so incrementing would double-count)
            fresh = self.storage.get_node(node_id)
            if fresh is not None:
                node.access_count = fresh.access_count
                node.last_accessed_at = fresh.last_accessed_at
                node.updated_at = fresh.updated_at
                node.metadata[self.REINFORCED_AT_KEY] = \
                    fresh.metadata.get(self.REINFORCED_AT_KEY, now)
        return len(edges)

    def should_reinforce(self, node) -> bool:
        """Throttle on the LAST REINFORCEMENT time, not last access —
        last_accessed_at resets on every hit, which would starve
        frequently-used nodes of reinforcement entirely."""
        last = float(node.metadata.get(self.REINFORCED_AT_KEY, 0.0))
        idle_days = (time.time() - last) / 86400.0
        return idle_days >= self.config.access_reinforcement_days

    def get_pruned_edges(self) -> List[str]:
        return [e.id for e in self.storage.all_edges()
                if e.weight < self.config.prune_threshold]
