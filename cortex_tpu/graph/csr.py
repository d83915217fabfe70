"""Device adjacency mirror: padded neighbor tables + masked BFS hops.

The TPU-form of the reference's graph-proximity scoring
(crates/cortex-core/src/vector/hybrid.rs:189-225 walks a BFS from each
anchor). Ragged adjacency is packed into a fixed-degree neighbor table

    nbrs [N, MAX_DEG] int32   (row indices into the corpus; -1 = pad)

and multi-source BFS depth becomes `max_hops` rounds of vectorized
min-plus over gathered neighbor distances — no frontier queues, no
data-dependent shapes, everything jit-compiled:

    dist <- min(dist, min_over_deg(dist[nbrs]) + 1)

Degree is capped (hub truncation) the way the reference caps auto-edges
per node at 50 (linker/auto_linker.rs:261-273); SURVEY §7 "hard parts"
item 4. The mirror versions itself against the AdjacencyCache so it
rebuilds only after graph mutations.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .cache import AdjacencyCache

INF_DEPTH = np.int32(2**30)
DEFAULT_MAX_DEG = 64


def _pad_deg(d: int) -> int:
    return max(8, ((d + 7) // 8) * 8)


@jax.jit
def _bfs_hops(nbrs: jnp.ndarray, dist0: jnp.ndarray,
              hops: jnp.ndarray) -> jnp.ndarray:
    """dist0 [N] int32 (0 at sources, INF elsewhere); runs MAX_HOPS rounds
    but only `hops` of them take effect (static loop, masked update)."""

    def body(i, dist):
        idx = jnp.where(nbrs >= 0, nbrs, 0)
        vals = dist[idx]                               # [N, DEG]
        vals = jnp.where(nbrs >= 0, vals, INF_DEPTH)
        relaxed = jnp.minimum(dist, jnp.min(vals, axis=1) + 1)
        return jnp.where(i < hops, relaxed, dist)

    return jax.lax.fori_loop(0, 8, body, dist0)  # 8 = static max hop count


class DeviceGraphMirror:
    """Undirected padded-neighbor adjacency on device, keyed to a
    node-id <-> row mapping shared with the embedding corpus."""

    def __init__(self, cache: AdjacencyCache, *,
                 max_deg: int = DEFAULT_MAX_DEG):
        self._cache = cache
        self._max_deg = max_deg
        self._built_version = -1
        self._row_of: Dict[str, int] = {}
        self._id_of: List[str] = []
        self._nbrs: Optional[jnp.ndarray] = None
        self.truncated_nodes = 0   # hubs that lost neighbors to the cap

    @property
    def n(self) -> int:
        return len(self._id_of)

    def row_of(self, node_id: str) -> Optional[int]:
        self.ensure()
        return self._row_of.get(node_id)

    def id_of(self, row: int) -> str:
        return self._id_of[row]

    def ensure(self) -> None:
        if self._built_version == self._cache.version and \
                self._nbrs is not None:
            return
        ids = sorted(self._cache.all_node_ids())
        self._row_of = {i: r for r, i in enumerate(ids)}
        self._id_of = ids
        n = len(ids)
        deg = _pad_deg(self._max_deg)
        nbrs = np.full((max(n, 8), deg), -1, np.int32)
        self.truncated_nodes = 0
        for i, nid in enumerate(ids):
            seen = set()
            col = 0
            for a in (self._cache.outgoing(nid) + self._cache.incoming(nid)):
                r = self._row_of.get(a.neighbor)
                if r is None or r in seen:
                    continue
                if col >= deg:
                    self.truncated_nodes += 1
                    break
                nbrs[i, col] = r
                seen.add(r)
                col += 1
        self._nbrs = jnp.asarray(nbrs)
        self._built_version = self._cache.version

    def per_anchor_depths(self, anchor_ids: Sequence[str],
                          max_hops: int) -> Dict[str, "np.ndarray"]:
        """depth-from-each-anchor, batched: one vmapped BFS over an
        [A, N] distance matrix. Returns {node_id: [A] int32 depths}
        (entries omitted when unreachable from every anchor)."""
        self.ensure()
        if self._nbrs is None or self.n == 0:
            return {}
        rows = [(a, self._row_of[a]) for a in anchor_ids
                if a in self._row_of]
        if not rows:
            return {}
        n_pad = self._nbrs.shape[0]
        dist0 = np.full((len(rows), n_pad), INF_DEPTH, np.int32)
        for j, (_, r) in enumerate(rows):
            dist0[j, r] = 0
        hops = jnp.int32(min(max_hops, 8))
        dist = np.asarray(jax.vmap(_bfs_hops, in_axes=(None, 0, None))(
            self._nbrs, jnp.asarray(dist0), hops))     # [A, n_pad]
        out: Dict[str, np.ndarray] = {}
        reachable = (dist[:, :self.n] <= max_hops).any(axis=0)
        for i in np.nonzero(reachable)[0]:
            out[self._id_of[int(i)]] = dist[:, int(i)]
        return out

    def anchor_row_ids(self, anchor_ids: Sequence[str]) -> List[str]:
        """Anchor ids present in the graph, in per_anchor_depths order."""
        self.ensure()
        return [a for a in anchor_ids if a in self._row_of]

    def depths_from(self, anchor_ids: Sequence[str],
                    max_hops: int) -> Dict[str, int]:
        """Min depth from any anchor for every reachable node (<= max_hops)."""
        self.ensure()
        if self._nbrs is None or self.n == 0:
            return {}
        rows = [self._row_of[a] for a in anchor_ids if a in self._row_of]
        if not rows:
            return {}
        n_pad = self._nbrs.shape[0]
        dist0 = np.full(n_pad, INF_DEPTH, np.int32)
        dist0[rows] = 0
        dist = np.asarray(_bfs_hops(self._nbrs, jnp.asarray(dist0),
                                    jnp.int32(min(max_hops, 8))))
        out: Dict[str, int] = {}
        for i in range(self.n):
            d = int(dist[i])
            if d <= max_hops:
                out[self._id_of[i]] = d
        return out

    def proximity_scores(self, anchor_ids: Sequence[str],
                         max_hops: int) -> Dict[str, float]:
        """graph score = 1 / (1 + depth) (hybrid.rs:189-225)."""
        return {i: 1.0 / (1.0 + d)
                for i, d in self.depths_from(anchor_ids, max_hops).items()}
