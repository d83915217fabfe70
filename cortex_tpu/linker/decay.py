"""Edge decay engine — device-vectorized sweep.

Behavioral parity with crates/cortex-core/src/linker/decay.rs:21-157
(exponential decay with importance shielding, manual exemption, delete
below threshold, prune counting, reinforce-on-access), but the per-edge
loop becomes ONE fused array op (cortex_tpu.ops.decay.decay_sweep) over
packed [E] arrays — the O(E) sweep the BASELINE targets at 10M+ edges.
Host applies the results (weight writes / deletions) in batch.
"""

from __future__ import annotations

import time
from typing import List, Tuple

import jax.numpy as jnp
import numpy as np

from ..ops.decay import (DEVICE_SWEEP_MIN_EDGES, decay_sweep,
                         decay_sweep_host)
from ..storage.base import Storage
from ..types import EdgeProvenance
from .config import DecayConfig


class DecayEngine:
    def __init__(self, storage: Storage, config: DecayConfig):
        self.storage = storage
        self.config = config

    def apply_decay(self, now: float | None = None) -> Tuple[int, int]:
        """Sweep all edges. Returns (pruned_count, deleted_count)."""
        now = time.time() if now is None else now
        edges = self.storage.all_edges()
        if not edges:
            return 0, 0

        e_count = len(edges)
        weights = np.empty(e_count, np.float32)
        days = np.empty(e_count, np.float32)
        max_imp = np.empty(e_count, np.float32)
        exempt = np.empty(e_count, bool)

        imp_cache: dict[str, float] = {}

        def importance(nid: str) -> float:
            v = imp_cache.get(nid)
            if v is None:
                n = self.storage.get_node(nid)
                v = n.importance if n is not None else 0.0
                imp_cache[nid] = v
            return v

        for i, e in enumerate(edges):
            weights[i] = e.weight
            days[i] = (now - e.updated_at) / 86400.0
            max_imp[i] = max(importance(e.from_id), importance(e.to_id))
            exempt[i] = self.config.exempt_manual and e.provenance.is_manual

        if e_count >= DEVICE_SWEEP_MIN_EDGES:
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
            new_w = _fetch_array(new_w)
            delete = _fetch_array(delete)
            prune = _fetch_array(prune)
            changed = _fetch_array(changed)
        else:
            new_w, delete, prune, changed = decay_sweep_host(
                weights, days, max_imp, exempt,
                self.config.daily_decay_rate,
                self.config.importance_shield,
                self.config.delete_threshold,
                self.config.prune_threshold)

        deleted_count = 0
        pruned_count = 0
        for i, e in enumerate(edges):
            if delete[i]:
                if self.storage.delete_edge(e.id):
                    deleted_count += 1
            elif changed[i]:
                # decay writes don't touch updated_at — the decay clock
                # keeps running (weight RMW only)
                self.storage.update_edge_weight_atomic(
                    e.id, float(new_w[i]), touch=False)
                if prune[i]:
                    pruned_count += 1
        return pruned_count, deleted_count

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
