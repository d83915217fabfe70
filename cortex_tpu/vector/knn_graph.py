"""kNN graph over the IVF block layout — the refinement structure.

Why this exists: the r3 10M measurements showed IVF's candidate recall
is STRUCTURALLY capped (~0.83-0.87 at practical nprobe; flat in nprobe
— 8x probes buys +0.05, BASELINE.md "Spill packing + probe-policy
study") because ~15% of true top-10 rows sit in clusters that rank
arbitrarily against the query centroid. No probe policy reaches them.
What DOES reach them: true neighbors of each other — a missed top-10
row is, with high probability, a near neighbor of a FOUND top-10 row.
This module materializes that structure as a fixed-degree kNN graph
(`[N, R]` int32, the reference's HNSW neighbor lists flattened to the
TPU-friendly padded-array form SURVEY §7 hard-part #1 names), and the
search path expands its candidate frontier through it into the exact
re-rank (IvfCorpus._expand_candidates).

Build (device): for each cluster block `[L, d]` of the already-built
IVF layout, one int8 self-matmul scores every within-block pair
(MXU work, no gathers — the layout IS the candidate structure), and a
per-slot top-R keeps the best neighbors. Because spill packing already
duplicates boundary rows into their second-choice cluster (23% of rows
at default slack), the union of a row's per-copy lists contains
cross-cluster edges exactly where they matter — on the boundary rows
IVF misses. All chunks are ONE compiled program (`lax.dynamic_slice`
over the cluster axis, static chunk shape) dispatched back-to-back and
drained with a single fetch (the topk_stream trick — per-chunk drains
through a tunneled device would pay ~100 RTTs).

Edge score: true cosine x·y, recovered from centered-int8 operands as
  s32 * rinv_x * rinv_y  =  (x-mu)·(y-mu)
  x·y = (x-mu)·(y-mu) + x·mu + y·mu - mu·mu
Per source row x, ranking over candidates y needs only the y-dependent
terms, so the kernel adds the dequantized y·mu back ((blk@mu)*rinv —
exact up to int8 noise) and drops the per-x and global constants.
Without this term the centered self-scores would rank by residual
similarity — on anisotropic encoder geometry that diverges from the
cosine ranking the search path uses.

Merge (host, vectorized): rows with one copy take their block list
as-is; spilled rows interleave their two desc-sorted lists
positionally (round-robin), dedup keep-first, compact. No giant sort:
the per-row lists stay sorted from the device top_k.

Maintenance: mutated rows (update/remove) drop their OUT-edges
(`_nbrs_h[row] = -1`); stale IN-edges pointing at a mutated row are
harmless — expansion re-checks liveness/filters and the exact re-rank
scores the current vector, so a stale edge costs one wasted candidate,
never a wrong result. The graph is rebuilt with the layout on retrain
and persisted in the snapshot sidecar (id-relative, remapped on load).

Reference parity note: this replaces the recall role of HNSW's graph
walk (crates/cortex-core/src/vector/index.rs:104-163) with a
TPU-native two-phase design — coarse probe (IVF) + one-hop graph
expansion — instead of a sequential beam descent.
"""

from __future__ import annotations

import functools
import logging
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.similarity import NEG_INF

log = logging.getLogger("cortex.knn_graph")

#: cluster-axis chunk HBM budget: the [CH, L, L] int32+fp32 score
#: planes are the build's working set
GRAPH_BUDGET_BYTES = 1 << 30


def dedup_keep_first(vals: np.ndarray, valid: np.ndarray
                     ) -> np.ndarray:
    """Row-wise duplicate masking for [B, C] candidate lists: among
    entries with equal values, keep the FIRST (original order — the
    stable sort ties break by position) and mark the rest invalid.
    Invalid entries never collide (keyed as -1, grouped apart from
    real row 0). Returns the narrowed validity mask."""
    key = np.where(valid, vals, -1)
    o = np.argsort(key, axis=1, kind="stable")
    sk = np.take_along_axis(key, o, axis=1)
    dup = np.zeros_like(valid)
    dup[:, 1:] = (sk[:, 1:] == sk[:, :-1]) & (sk[:, 1:] >= 0)
    dd = np.zeros_like(valid)
    np.put_along_axis(dd, o, dup, axis=1)
    return valid & ~dd


def _chunk_clusters(c: int, lcap: int) -> int:
    """Cluster-axis chunk size: power of two keeping the [CH, L, L]
    score planes (8 bytes/entry across the int32+fp32 stages) under
    budget."""
    ch = max(1, GRAPH_BUDGET_BYTES // max(1, 8 * lcap * lcap))
    p = 1
    while p * 2 <= min(ch, c):
        p *= 2
    return p


@functools.partial(jax.jit, static_argnames=("ch", "r"))
def _block_knn(emb_i8, rinv_sl, slot_rows, mu, start, *, ch: int,
               r: int):
    """Within-block top-r neighbor lists for `ch` clusters starting at
    `start` (traced — one compiled program covers every chunk).
    Returns [ch, L, r] int32 global rows, -1 where masked."""
    lcap, d = emb_i8.shape[1], emb_i8.shape[2]
    blk = jax.lax.dynamic_slice(emb_i8, (start, 0, 0), (ch, lcap, d))
    ri = jax.lax.dynamic_slice(rinv_sl, (start, 0), (ch, lcap))
    sr = jax.lax.dynamic_slice(slot_rows, (start, 0), (ch, lcap))
    s32 = jax.lax.dot_general(
        blk, blk, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.int32)            # [ch, L, L]
    s = s32.astype(jnp.float32) * ri[:, :, None] * ri[:, None, :]
    # + y·mu (dequantized): rank-corrects centered scores to cosine
    mud = jnp.dot(blk.astype(jnp.float32), mu,
                  preferred_element_type=jnp.float32) * ri  # [ch, L]
    s = s + mud[:, None, :]
    live = sr >= 0
    eye = jnp.eye(lcap, dtype=bool)
    s = jnp.where(live[:, None, :] & ~eye[None], s,
                  jnp.float32(NEG_INF))
    v, idx = jax.lax.top_k(s, r)
    rows = jnp.take_along_axis(
        jnp.broadcast_to(sr[:, None, :], s.shape), idx, axis=2)
    return jnp.where(v > -1e29, rows, -1)


def build_knn_graph(emb_i8, rinv_sl, slot_rows, mu, *, degree: int,
                    cap: int, rows: np.ndarray,
                    cluster_of: np.ndarray, slot_of: np.ndarray,
                    cluster_of2: np.ndarray, slot_of2: np.ndarray,
                    fetch=np.asarray) -> Optional[np.ndarray]:
    """Build the [cap, degree] neighbor table from the block layout.

    emb_i8/rinv_sl/slot_rows: the layout planes, host numpy or
    device-resident jnp (device-resident preferred — zero upload; the
    sharded subclass passes its host copies and pays chunk uploads,
    which only runs on virtual-mesh tests in this image). mu: the
    centering vector the layout was quantized with. rows: live global
    rows; cluster_of/slot_of (+2: spill copy, -1 when none) index the
    layout per row.
    """
    t0 = time.monotonic()
    c, lcap = int(emb_i8.shape[0]), int(emb_i8.shape[1])
    r0 = min(degree, lcap - 1)
    if r0 <= 0 or len(rows) == 0:
        return None
    ch = _chunk_clusters(c, lcap)
    mu_d = jnp.asarray(mu, dtype=jnp.float32)
    # fixed chunk shape without padding the (multi-GB at 10M) layout:
    # the final chunk CLAMPS its start and overlaps the previous one —
    # overlapped clusters recompute identical lists and the host
    # assembly below just rewrites them
    starts = list(range(0, max(1, c - ch + 1), ch))
    if starts[-1] + ch < c:
        starts.append(c - ch)
    if isinstance(emb_i8, np.ndarray):
        # host layout (sharded subclass): slice chunks host-side and
        # upload each — one jnp.asarray of the whole layout would
        # materialize it on a single device
        chunks = [
            _block_knn(jnp.asarray(emb_i8[s:s + ch]),
                       jnp.asarray(rinv_sl[s:s + ch]),
                       jnp.asarray(slot_rows[s:s + ch]),
                       mu_d, jnp.int32(0), ch=ch, r=r0)
            for s in starts
        ]
    else:
        emb_d, ri_d, sr_d = emb_i8, rinv_sl, slot_rows
        chunks = [
            _block_knn(emb_d, ri_d, sr_d, mu_d, jnp.int32(s),
                       ch=ch, r=r0)
            for s in starts
        ]
    # ONE drain: concat on device, fetch once (tunnel-RTT discipline);
    # callers on the watchdog protocol pass shard._fetch_array so a
    # wedged tunnel raises DeviceFetchTimeout instead of hanging
    big = fetch(jnp.concatenate(chunks, axis=0))
    nl = np.empty((c, lcap, r0), np.int32)
    for j, s in enumerate(starts):
        nl[s:s + ch] = big[j * ch:(j + 1) * ch][:c - s]

    out = np.full((cap, degree), -1, np.int32)
    cl1, sl1 = cluster_of[rows], slot_of[rows]
    prim = nl[cl1, sl1]                                   # [n, r0]
    has2 = cluster_of2[rows] >= 0
    solo = ~has2
    if solo.any():
        p = prim[solo]
        # a block can hold spill COPIES of other rows; within one
        # block all slots are distinct rows, so self-edges are already
        # masked by the kernel's eye — copy straight through
        out[rows[solo], :p.shape[1]] = p[:, :degree]
    if has2.any():
        rs = rows[has2]
        sec = nl[cluster_of2[rs], slot_of2[rs]]
        a = prim[has2]
        cand = np.empty((len(a), 2 * r0), np.int32)
        cand[:, 0::2] = a                 # positional interleave of two
        cand[:, 1::2] = sec               # desc-sorted lists
        valid = dedup_keep_first(cand, (cand >= 0)
                                 & (cand != rs[:, None]))
        comp = np.argsort(~valid, axis=1, kind="stable")[:, :degree]
        res = np.take_along_axis(np.where(valid, cand, -1), comp,
                                 axis=1)
        out[rs, :res.shape[1]] = res
    deg = float((out[rows] >= 0).mean()) * degree
    log.info("knn graph: %d rows, degree %d (mean filled %.1f), "
             "%d clusters x %d chunked %d, %.2fs",
             len(rows), degree, deg, c, lcap, ch,
             time.monotonic() - t0)
    return out
