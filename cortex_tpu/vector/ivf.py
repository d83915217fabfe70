"""IVF (inverted-file) index — the sublinear search option.

Parity surface: the reference gets sublinear search from HNSW
(crates/cortex-core/src/vector/index.rs:104-163, hnsw_rs graph walk)
and tops out at ~1M vectors (ARCHITECTURE.md:314). A graph walk is
hostile to TPUs — pointer-chasing, data-dependent control flow, tiny
gathers — so the TPU-native sublinear structure is IVF:

  * build: spherical k-means over the corpus (trained ON DEVICE in one
    jitted loop — assignment matmuls ride the MXU) produces C
    centroids; members are packed into a padded [C, L, d] int8 block
    layout (centered quantization, ranking-invariant — see
    ops.similarity.quantize_rows_centered) with per-slot global-row
    ids and kind/agent codes.
  * search: ONE fused dispatch — queries score all centroids [B, C]
    (matmul), take the top-`nprobe` clusters per query, gather those
    blocks ([B, nprobe, L, d] — contiguous block gather, not row
    gather), int8-score the B * nprobe * L candidates with liveness/
    kind/agent/exclusion bias applied in-kernel, and return the top
    `cand` GLOBAL row indices per query.
  * finish: the returned rows feed DeviceCorpus._finish_topk with
    rescore=True — the same exact fp32 host re-rank the flat quant
    path uses. IVF changes the candidate generator, never the scoring
    contract: final scores are fp32-true; the only approximation is
    candidate membership (a true top-k row in an unprobed cluster).

Compute per query drops from O(N*d) (flat scan) to O((C + nprobe*L)*d)
— at 10M rows with C=4096, nprobe=16 that is ~100x less arithmetic,
which is what buys small-batch/latency-sensitive serving at 10M+ where
the flat scan's O(N) per dispatch dominates (BASELINE.md 10M row).
HBM cost is slack/avg_fill x the flat int8 shadow (padded slots).

Everything else — id<->row maps, dirty tracking, growth ladder,
snapshots/deltas, filter encoding, k/batch bucketing, generation
checks, the dispatch-outside-the-lock protocol — is inherited from
DeviceCorpus. Incremental slot scatters DONATE the layout planes (a
functional update would transiently double-buffer ~13 GB at 10Mx768 —
an OOM at exactly the scale IVF serves); a search that captured the
previous tuple mid-scatter is rejected loudly by the runtime and
re-dispatched via the inherited _donated_buffer_race retry protocol,
and row-reassignment races are caught by the inherited generation
check.
"""

from __future__ import annotations

import functools
import json
import logging
import math
import os
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import ivf_gather
from ..ops.similarity import NEG_INF, quantize_rows_centered
from .index import TpuFlatIndex
from .shard import (DeviceCorpus, MAX_EXCLUDE, MAX_FILTER_KINDS,
                    NO_FILTER, PAD_CODE, _norm_rows, _pad_pow2)

log = logging.getLogger("cortex.ivf")

#: auto-nlist ceiling: past this the centroid scan itself starts to
#: cost like a small flat scan (C*d per query)
MAX_AUTO_NLIST = 8192
#: slot slack over perfectly-balanced fill — spill headroom for k-means
#: imbalance and incremental inserts between retrains
SLOT_SLACK = 1.3
#: retrain when the live count drifts this far from the trained count
RETRAIN_GROWTH = 2.0
#: HBM budget for the in-kernel probed-block gather ([B, p, L, d] int8
#: materializes before scoring — at 10M rows x nprobe=nlist/8 that is
#: ~1.3 GB PER QUERY, so a batch-64 dispatch would want ~80 GB).
#: Queries are processed in lax.map chunks sized to stay under this;
#: small corpora fit one chunk and compile to the original fused form.
#: Env-tunable: corpora near HBM capacity want a smaller budget.
GATHER_BUDGET_BYTES = int(os.environ.get(
    "CORTEX_IVF_GATHER_BUDGET", 2 << 30))
#: CORTEX_IVF_PALLAS=0 forces the XLA gather path on TPU (debugging)
PALLAS_ENABLED = os.environ.get("CORTEX_IVF_PALLAS", "1") != "0"
#: incremental slot scatters chunk to this bound so the whole
#: power-of-two program family is pre-compilable (warm_scatter_buckets)
MAX_SCATTER_ROWS = 1024
#: graph refinement frontier: the top-E int8-ranked candidates whose
#: kNN-graph neighbors join the exact re-rank (knn_graph.py). Host-leg
#: cost grows ~E*degree extra re-ranked rows per query — sized for the
#: small-batch regime IVF serves (the flat scan owns large batches)
REFINE_FRONTIER = int(os.environ.get("CORTEX_IVF_REFINE_FRONTIER", 16))
#: expansion hops: 1 = neighbors of found candidates (the measured
#: recall lever); 2+ re-expands from the exact-scored top of each
#: hop's additions (one extra host BLAS pass per hop)
REFINE_HOPS = int(os.environ.get("CORTEX_IVF_REFINE_HOPS", 1))
#: recall-target nprobe tuning ([embedding] ivf_target_recall): corpus
#: rows sampled as self-queries at (re)train time to measure the
#: probe-hit curve
TUNE_SAMPLES = int(os.environ.get("CORTEX_IVF_TUNE_SAMPLES", 256))
#: the recall@k the tuner measures (the serving metric's k)
TUNE_TRUTH_K = 10
#: the background warm-ahead only engages for layouts of at least this
#: many slots (C*L): the warm compiles ~25 programs, and through a
#: tunneled device each compile RPC head-of-line-blocks serving — worth
#: it to protect a crossing that would cost 80 s at production scale,
#: pure overhead for a tiny corpus whose rebuilds take milliseconds
#: (measured: a 4-node IVF server's writes crawled to ~120 s each while
#: the background warm compiled dead tiny-shape programs)
WARM_MIN_SLOTS = 1 << 16


# ---------------------------------------------------------------- training


@functools.partial(jax.jit, static_argnames=("c", "iters"))
def _kmeans_device(data: jnp.ndarray, init: jnp.ndarray, *,
                   c: int, iters: int) -> jnp.ndarray:
    """Spherical k-means: Lloyd iterations entirely on device.

    data [S, d] unit-norm fp32; init [C, d] (sampled data rows).
    Assignment is one [S, C] matmul per iteration (MXU work);
    centroids re-normalize each step (cosine geometry); empty clusters
    keep their previous centroid."""

    def step(_, cent):
        assign = jnp.argmax(
            jnp.dot(data, cent.T, preferred_element_type=jnp.float32),
            axis=1)
        sums = jax.ops.segment_sum(data, assign, num_segments=c)
        counts = jax.ops.segment_sum(
            jnp.ones((data.shape[0],), jnp.float32), assign,
            num_segments=c)
        norm = jnp.linalg.norm(sums, axis=1, keepdims=True)
        fresh = sums / jnp.maximum(norm, 1e-12)
        return jnp.where(counts[:, None] > 0, fresh, cent)

    return jax.lax.fori_loop(0, iters, step, init)


@jax.jit
def _assign_top2(data: jnp.ndarray, cent: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray,
                            jnp.ndarray, jnp.ndarray]:
    """Per-row best-2 clusters and their scores — overflow fallback for
    capped packing, and the (choice, margin) inputs of spill packing.

    Two fused argmax passes instead of lax.top_k: the full sort
    materializes TWO [S, C] copies as HLO temps (f32 values + s32
    iota) on top of the scores — 12.6 GB at the 10M build's 500k-row
    chunks against nlist 3162, a measured compile-time OOM. The
    masked-second-argmax re-reads the one score buffer; the where
    fuses into the reduction."""
    s = jnp.dot(data, cent.T, preferred_element_type=jnp.float32)
    a1 = jnp.argmax(s, axis=1).astype(jnp.int32)
    v1 = jnp.max(s, axis=1)
    cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s2 = jnp.where(cols == a1[:, None], -jnp.inf, s)
    a2 = jnp.argmax(s2, axis=1).astype(jnp.int32)
    v2 = jnp.max(s2, axis=1)
    if cent.shape[0] == 1:                # no second choice exists
        a2, v2 = a1, v1
    return a1, a2, v1, v2


# ----------------------------------------------------------------- search


def _dedup_rows(v, rows):
    """Suppress spilled duplicates in a candidate list. A row packed
    into TWO clusters (spill) can surface twice when both are probed;
    the exact re-rank scores both copies identically, so without this
    mask a node could appear twice in the final top-k. Keep the first
    (highest-int8-score) occurrence, send later ones to NEG_INF.
    O(cand^2) compare — candidate lists are <= ~1k wide, and this fuses
    into the search dispatch (no extra round trip). Runs INSIDE the
    per-query chunk body so the [qc, cand, cand] compare temps are
    bounded by the same HBM budget as the gather (_dedup_per_q); it is
    compiled out entirely (static `dedup` flag) when the layout holds
    no spill copies."""
    cand = rows.shape[1]
    earlier = jnp.tril(jnp.ones((cand, cand), jnp.bool_), -1)
    dup = jnp.any((rows[:, :, None] == rows[:, None, :])
                  & earlier[None], axis=2)
    v = jnp.where(dup, NEG_INF, v)
    return v, jnp.where(v > -1e29, rows, 0)


def _dedup_per_q(cand: int) -> int:
    """Per-query HBM bytes the dedup compare materializes (the eq/tril
    predicate planes; bools are byte-wide on TPU)."""
    return 2 * cand * cand


def _ivf_bias(sr2, kc2, ac2, ak, aa, ex):
    """Additive bias over flattened candidate slots: empty slots,
    kind/agent mismatches and excluded global rows go to NEG_INF —
    the [C, L] analog of shard._build_bias."""
    bias = jnp.where(sr2 >= 0, 0.0, NEG_INF)
    kind_on = ak[0] != NO_FILTER
    kind_ok = jnp.any(kc2[:, :, None] == ak[None, None, :], axis=2)
    bias = bias + jnp.where(kind_on & ~kind_ok, NEG_INF, 0.0)
    agent_on = aa != NO_FILTER
    bias = bias + jnp.where(agent_on & (ac2 != aa), NEG_INF, 0.0)
    excluded = jnp.any(sr2[:, :, None] == ex[None, None, :], axis=2)
    return bias + jnp.where(excluded, NEG_INF, 0.0)


def _ivf_candidates(emb_i8, rinv_sl, slot_rows, probe, q):
    """Gather the probed blocks and int8-score every slot in them.

    Returns (scores [B, p*L] fp32 — descaled approximate q.(x-mu),
    rows [B, p*L] int32 global row per slot, -1 for empty)."""
    blk = emb_i8[probe]                       # [B, p, L, d] block gather
    sr = slot_rows[probe]                     # [B, p, L]
    ri = rinv_sl[probe]
    b = q.shape[0]
    d = q.shape[1]
    pl = blk.shape[1] * blk.shape[2]
    qs = 127.0 / jnp.maximum(jnp.max(jnp.abs(q), axis=1), 1e-12)
    qi8 = jnp.clip(jnp.round(q * qs[:, None]), -127, 127).astype(jnp.int8)
    s32 = jax.lax.dot_general(
        blk.reshape(b, pl, d), qi8,
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32)     # [B, p*L]
    s = s32.astype(jnp.float32) * (ri.reshape(b, pl) / qs[:, None])
    return s, sr.reshape(b, pl)


def _chunked_topk(body, q, probe, *, cand: int, pl: int,
                  per_q: Optional[int] = None):
    """Run `body(q_chunk, probe_chunk) -> (v, rows)` over query chunks
    with lax.map, concatenating on the batch axis. `body` must return
    [qc, cand'] columns. One-chunk batches call the body directly (the
    original fully-fused form). per_q = HBM bytes a single query's
    trace materializes (default: the XLA path's [p, L, d] int8 gather);
    chunks are sized to keep qc * per_q under GATHER_BUDGET_BYTES."""
    b, d = q.shape
    p = probe.shape[1]
    if per_q is None:
        per_q = pl * d                        # int8 bytes gathered/query
    qc = max(1, min(b, GATHER_BUDGET_BYTES // max(1, per_q)))
    if qc >= b:
        v, rows = body(q, probe)
    else:
        nc = -(-b // qc)
        pad = nc * qc - b
        qp = jnp.pad(q, ((0, pad), (0, 0)))
        pp = jnp.pad(probe, ((0, pad), (0, 0)))
        v, rows = jax.lax.map(
            lambda args: body(*args),
            (qp.reshape(nc, qc, d), pp.reshape(nc, qc, p)))
        v = v.reshape(nc * qc, -1)[:b]
        rows = rows.reshape(nc * qc, -1)[:b]
    return v, jnp.where(v > -1e29, rows, 0)


@functools.partial(jax.jit, static_argnames=("p", "cand", "dedup"))
def _ivf_search(cent, emb_i8, rinv_sl, slot_rows, kind_sl, agent_sl,
                ak, aa, ex, q, *, p: int, cand: int, dedup: bool
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused IVF probe + scan + top-cand in ONE dispatch (query-chunked
    internally when the probed-block gather would blow HBM)."""
    cs = jnp.dot(q, cent.T, preferred_element_type=jnp.float32)
    _, probe = jax.lax.top_k(cs, p)           # [B, p]
    pl = p * emb_i8.shape[1]
    cc = min(cand, pl)

    def body(qq, pr):
        s, sr2 = _ivf_candidates(emb_i8, rinv_sl, slot_rows, pr, qq)
        bb = s.shape[0]
        kc2 = kind_sl[pr].reshape(bb, pl)
        ac2 = agent_sl[pr].reshape(bb, pl)
        s = s + _ivf_bias(sr2, kc2, ac2, ak, aa, ex)
        v, idx = jax.lax.top_k(s, cc)
        r = jnp.take_along_axis(sr2, idx, axis=1)
        return _dedup_rows(v, r) if dedup else (v, r)

    return _chunked_topk(body, q, probe, cand=cand,
                         pl=pl, per_q=pl * q.shape[1]
                         + (_dedup_per_q(cc) if dedup else 0))


@functools.partial(jax.jit, static_argnames=("p", "cand", "dedup"))
def _ivf_search_hostbias(cent, emb_i8, rinv_sl, slot_rows, bias, q,
                         *, p: int, cand: int, dedup: bool
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Overflow-filter variant: exact host-computed [cap] bias,
    gathered per candidate slot by global row — never truncates
    (same posture as shard._fused_search_hostbias)."""
    cs = jnp.dot(q, cent.T, preferred_element_type=jnp.float32)
    _, probe = jax.lax.top_k(cs, p)
    pl = p * emb_i8.shape[1]
    cc = min(cand, pl)

    def body(qq, pr):
        s, sr2 = _ivf_candidates(emb_i8, rinv_sl, slot_rows, pr, qq)
        slot_bias = bias[jnp.clip(sr2, 0, bias.shape[0] - 1)]
        s = s + jnp.where(sr2 >= 0, slot_bias, NEG_INF)
        v, idx = jax.lax.top_k(s, cc)
        r = jnp.take_along_axis(sr2, idx, axis=1)
        return _dedup_rows(v, r) if dedup else (v, r)

    return _chunked_topk(body, q, probe, cand=cand,
                         pl=pl, per_q=pl * q.shape[1]
                         + (_dedup_per_q(cc) if dedup else 0))


def _descale_valid(v, qs):
    """Divide the positive per-query quantization scale back out of
    valid entries ONLY: dividing the NEG_INF mask sentinel by qs
    (>= 127 for unit-norm queries) would lift it above the -1e29
    dead-hit threshold every downstream consumer checks."""
    return jnp.where(v > NEG_INF / 2, v / qs[:, None], v)


def _quantize_queries(qq):
    """Per-query symmetric int8 quantization (same scheme as
    _ivf_candidates). Returns (qi8, qs) with qs the positive per-query
    scale — ranking-invariant, divided back out of reported values."""
    qs = 127.0 / jnp.maximum(jnp.max(jnp.abs(qq), axis=1), 1e-12)
    qi8 = jnp.clip(jnp.round(qq * qs[:, None]), -127, 127
                   ).astype(jnp.int8)
    return qi8, qs


@functools.partial(jax.jit, static_argnames=("k",))
def _tune_chunk_topk(blk, ri, sr, q, *, k: int
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k of the sampled tuner queries against ONE cluster
    chunk of the layout, using the SAME int8-descaled scoring the
    serving kernel ranks by (so the tuner's 'truth' is the truth the
    candidate generator could at best produce at full probe). blk
    [cc, L, d] int8 centered rows, ri/sr [cc, L], q [S, d] fp32.
    Returns ([S, k] scores, [S, k] global rows)."""
    cc, L, d = blk.shape
    qi8, qs = _quantize_queries(q)
    s32 = jax.lax.dot_general(
        qi8, blk.reshape(cc * L, d),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)     # [S, cc*L]
    s = s32.astype(jnp.float32) * (ri.reshape(-1)[None, :]
                                   / qs[:, None])
    s = jnp.where(sr.reshape(-1)[None, :] >= 0, s, NEG_INF)
    v, idx = jax.lax.top_k(s, k)
    return v, sr.reshape(-1)[idx]


@functools.partial(jax.jit,
                   static_argnames=("p", "cand", "filtered", "dedup"))
def _ivf_search_pallas(cent, emb_i8, meta, ak, aa, ex, q, *,
                       p: int, cand: int, filtered: bool, dedup: bool
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """TPU path: probe selection in XLA, then the Mosaic scalar-prefetch
    gather-score kernel (ops/ivf_gather.py) — XLA's block gather
    materializes a relayout COPY of the whole [C, L, d] layout (the r3
    10M OOM) and reads at ~7.5 GB/s; the kernel streams exactly the
    probed blocks at ~400 GB/s. `filtered` statically compiles the
    in-kernel filter compare chain out for unfiltered serving."""
    cs = jnp.dot(q, cent.T, preferred_element_type=jnp.float32)
    _, probe = jax.lax.top_k(cs, p)
    l = emb_i8.shape[1]
    cc = min(cand, p * l)

    def body(qq, pr):
        qi8, qs = _quantize_queries(qq)
        s, rows = ivf_gather.probed_scores(
            emb_i8, meta, pr, qi8, ak, aa, ex, filtered=filtered)
        v, idx = jax.lax.top_k(s, min(cand, s.shape[1]))
        r = jnp.take_along_axis(rows, idx, axis=1)
        v = _descale_valid(v, qs)
        return _dedup_rows(v, r) if dedup else (v, r)

    return _chunked_topk(body, q, probe, cand=cand, pl=p * l,
                         per_q=_pallas_per_q(p, l)
                         + (_dedup_per_q(cc) if dedup else 0))


@functools.partial(jax.jit, static_argnames=("p", "cand", "dedup"))
def _ivf_search_pallas_hostbias(cent, emb_i8, meta, bias, q, *,
                                p: int, cand: int, dedup: bool
                                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Overflow-filter variant of the Pallas path: the kernel runs
    unfiltered (liveness only) and the exact host-computed [cap] bias
    is gathered per candidate slot by global row in XLA — a 1D
    scalar-source gather, which (unlike the block gather) lowers
    without relayout copies."""
    cs = jnp.dot(q, cent.T, preferred_element_type=jnp.float32)
    _, probe = jax.lax.top_k(cs, p)
    l = emb_i8.shape[1]
    cc = min(cand, p * l)
    nf_ak = jnp.full((MAX_FILTER_KINDS,), NO_FILTER, jnp.int32)
    nf_aa = jnp.full((1,), NO_FILTER, jnp.int32)
    nf_ex = jnp.full((MAX_EXCLUDE,), NO_FILTER, jnp.int32)

    def body(qq, pr):
        qi8, qs = _quantize_queries(qq)
        s, rows = ivf_gather.probed_scores(
            emb_i8, meta, pr, qi8, nf_ak, nf_aa, nf_ex, filtered=False)
        slot_bias = bias[jnp.clip(rows, 0, bias.shape[0] - 1)]
        s = s + jnp.where(s > NEG_INF / 2, slot_bias, 0.0)
        v, idx = jax.lax.top_k(s, min(cand, s.shape[1]))
        r = jnp.take_along_axis(rows, idx, axis=1)
        v = _descale_valid(v, qs)
        return _dedup_rows(v, r) if dedup else (v, r)

    return _chunked_topk(body, q, probe, cand=cand, pl=p * l,
                         per_q=_pallas_per_q(p, l)
                         + (_dedup_per_q(cc) if dedup else 0))


def _pallas_per_q(p: int, l: int) -> int:
    """Per-query HBM bytes for the Pallas path's chunk budget: the
    kernel never materializes the [p, L, d] gather — only the
    [p_pad, L] f32 score + row planes (plus the same-size top_k
    operand copies, hence the 2x safety factor)."""
    p_pad = -(-p // ivf_gather.META_SUBLANES) * ivf_gather.META_SUBLANES
    return 2 * 2 * 4 * p_pad * l


@functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3, 4))
def _scatter_slots(emb_i8, rinv_sl, slot_rows, kind_sl, agent_sl,
                   c_idx, s_idx, qv, ri, sr, kc, ac):
    """Donating per-slot scatter: a functional update would transiently
    double-buffer the whole block layout (~13 GB at 10Mx768 with
    default slack — an OOM at exactly the scale IVF exists for, the
    same failure shard._scatter_quant_rows donates to avoid). An
    in-flight search that captured the previous tuple is rejected
    loudly by the runtime and re-dispatched (_donated_buffer_race,
    the protocol every search path already runs)."""
    return (emb_i8.at[c_idx, s_idx].set(qv),
            rinv_sl.at[c_idx, s_idx].set(ri),
            slot_rows.at[c_idx, s_idx].set(sr),
            kind_sl.at[c_idx, s_idx].set(kc),
            agent_sl.at[c_idx, s_idx].set(ac))


@functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3, 4),
                   static_argnames=("pad",))
def _pad_slot_axis(emb_i8, rinv_sl, slot_rows, kind_sl, agent_sl, *,
                   pad):
    """Donating slot-axis growth: extend every [C, L, ...] plane with
    `pad` EMPTY slots per cluster IN HBM (~ms memcpy) instead of a
    full retrain + re-upload. A placement-full incremental write
    previously forced a whole-layout rebuild whose upload through a
    tunneled device measured ~20-30 s inside the corpus lock (the
    residual p99 event in the IVF mixed-workload soak); cluster
    assignments are untouched, so only the slot capacity changes."""
    c = emb_i8.shape[0]
    return (jnp.concatenate(
                [emb_i8, jnp.zeros((c, pad, emb_i8.shape[2]),
                                   jnp.int8)], axis=1),
            jnp.concatenate(
                [rinv_sl, jnp.zeros((c, pad), jnp.float32)], axis=1),
            jnp.concatenate(
                [slot_rows, jnp.full((c, pad), -1, jnp.int32)], axis=1),
            jnp.concatenate(
                [kind_sl, jnp.full((c, pad), PAD_CODE, jnp.int32)],
                axis=1),
            jnp.concatenate(
                [agent_sl, jnp.full((c, pad), PAD_CODE, jnp.int32)],
                axis=1))


@functools.partial(jax.jit, donate_argnums=(0,),
                   static_argnames=("pad",))
def _pad_meta_axis(meta, *, pad):
    """Slot-axis growth for the Pallas kernel's [C, 8, L] metadata
    plane — empty slots carry the same encoding _build_meta writes
    (row -1, kind/agent PAD_CODE, rinv 0)."""
    c = meta.shape[0]
    z = jnp.zeros((c, 8, pad), jnp.float32)
    z = z.at[:, ivf_gather.META_ROW].set(-1.0)
    z = z.at[:, ivf_gather.META_KIND].set(np.float32(PAD_CODE))
    z = z.at[:, ivf_gather.META_AGENT].set(np.float32(PAD_CODE))
    return jnp.concatenate([meta, z], axis=2)


@functools.partial(jax.jit, donate_argnums=(0,))
def _scatter_meta(meta, c_idx, s_idx, sr, kc, ac, ri):
    """Mirror of _scatter_slots for the Pallas kernel's packed [C, 8, L]
    f32 metadata layout (one [n, 8] column scatter); donating, same
    rationale (the meta plane is ~0.4 GB at 10M rows)."""
    n = c_idx.shape[0]
    vals = jnp.stack(
        [sr.astype(jnp.float32), kc.astype(jnp.float32),
         ac.astype(jnp.float32), ri] + [jnp.zeros((n,), jnp.float32)] * 4,
        axis=1)
    return meta.at[c_idx, :, s_idx].set(vals)


class IvfCorpus(DeviceCorpus):
    """DeviceCorpus whose device layout is the clustered [C, L, d]
    block structure; candidate generation runs the fused IVF kernel,
    everything downstream is inherited."""

    def __init__(self, dim: int, *, nlist: int = 0, nprobe: int = 0,
                 spill: float = 1.0, storage_dtype: str = "float32",
                 search_path: str = "auto", graph_degree: int = 32,
                 target_recall: float = 0.0):
        super().__init__(dim, search_path=search_path,
                         storage_dtype=storage_dtype)
        self._nlist_cfg = int(nlist)          # 0 = auto (~sqrt(N))
        self._nprobe_cfg = int(nprobe)        # 0 = auto (C/8, >= 8)
        #: recall-target nprobe tuning: when > 0 (and ivf_nprobe is
        #: auto), each fresh retrain samples corpus rows as
        #: self-queries, measures the probe-hit curve — the fraction
        #: of true top-10 rows (by the layout's own int8-exact
        #: scoring) whose home-or-spill cluster ranks inside the top-p
        #: probed — and sets the smallest ladder nprobe meeting the
        #: target. Geometry-adaptive: real-text corpora measured
        #: nprobe-LIMITED (+9 pts C/8 -> C/2 at 200k) while blocky
        #: synthetic ones measured FLAT (BASELINE.md "IVF on real-text
        #: geometry"); this knob replaces guessing with measuring.
        self._target_recall = min(1.0, max(0.0, float(target_recall)))
        self._nprobe_tuned = 0                # 0 = not tuned
        self._boot_nprobe_tuned = 0           # snapshot-restored
        self._boot_tune_curve: Optional[list] = None
        self._tune_curve: list = []           # last measured (p, rec)
        #: candidate-width escalation (VERDICT r4 #4): probe-hit only
        #: upper-bounds delivered recall — tie-dense geometry measured
        #: 0.973 end-to-end at probe-hit 1.0 (int8 candidate-boundary
        #: noise). The tuner cross-checks DELIVERED recall through the
        #: real dispatch and doubles the candidate width (up to 4x)
        #: when the probe-hit pick under-delivers.
        self._cand_boost = 1
        self._delivered_recall: Optional[float] = None
        self._boot_cand_boost = 0
        self._boot_delivered: Optional[float] = None
        self._info_pub: dict = {"trained": False}   # see _publish_info
        #: kNN-graph refinement degree (knn_graph.py): the graph is
        #: built from the block layout at (re)train time and search
        #: expands its candidate frontier through it into the exact
        #: re-rank — the structural-recall fix for rows whose clusters
        #: rank low against the query. 0 disables.
        self._graph_degree = max(0, int(graph_degree))
        self._nbrs_h: Optional[np.ndarray] = None     # [cap, degree]
        self._boot_nbrs: Optional[np.ndarray] = None  # snapshot-restored
        #: large-corpus graph builds run on a background thread (the
        #: inline build would extend the retrain's lock window by the
        #: whole [C, L, R] table fetch — minutes at 10M through a
        #: tunnel, the lock-held-stall class _grow_slots eliminates).
        #: seq invalidates in-flight builds across rebuilds/compacts;
        #: stale collects rows mutated while a build is in flight so
        #: the swap masks their out-edges
        self._graph_seq = 0
        self._graph_inflight = False
        self._graph_stale: set = set()
        #: fraction of the block layout's post-reserve slack filled
        #: with SPILLED duplicates — each boundary row (smallest
        #: first-vs-second centroid margin) is packed into its
        #: second-choice cluster too, so a true neighbor whose home
        #: cluster ranks low against the query gets a second chance to
        #: be probed (the SOAR insight, scaled to the slack the layout
        #: already allocates: ZERO extra HBM). 0 disables.
        self._spill = min(1.0, max(0.0, float(spill)))
        self._ivf_dev: Optional[Tuple[jnp.ndarray, ...]] = None
        self._centroids_h: Optional[np.ndarray] = None
        self._cluster_of = np.full((0,), -1, np.int32)   # [cap] by row
        self._slot_of = np.full((0,), -1, np.int32)      # [cap] by row
        # spill copy placement, -1 when a row has no second slot
        self._cluster_of2 = np.full((0,), -1, np.int32)
        self._slot_of2 = np.full((0,), -1, np.int32)
        self._cluster_free: List[List[int]] = []
        self._slot_cap = 0                    # L
        self._trained_live = 0
        #: True while the layout may hold spilled duplicate slots —
        #: gates the candidate dedup statically (compiled out when no
        #: spill copies exist). Set at build time; _apply_dirty only
        #: ever DROPS spill copies, so staying True between builds is
        #: conservative (dedup of a duplicate-free list is a no-op)
        self._has_spill = False
        #: [C, L, d] shape whose scatter-program family has been
        #: shape-only warmed; a rebuild changes C/L and the first
        #: search after it re-fires the background warm
        self._scatter_warmed: Optional[tuple] = None
        self._scatter_warm_pending = False
        #: dispatched search-program recipes, replayed shape-only at
        #: the NEXT slot rung by warm_next_slot_programs (the IVF
        #: analog of shard warm_growth_programs): (fn name, arg spec,
        #: p, cand, k_bucket, filtered, dedup)
        self._search_log: Dict[tuple, int] = {}
        # snapshot-restored clustering (TpuIvfIndex.load), consumed by
        # the next _build_ivf so boot skips the k-means retrain
        self._boot_cent: Optional[np.ndarray] = None
        self._boot_cluster: Optional[np.ndarray] = None
        self._boot_cluster2: Optional[np.ndarray] = None

    def state(self):
        """Host state + the trained clustering (centroids and per-id
        cluster), so a snapshot-restored index boots without
        re-running k-means + the full assignment pass (~90 s at 10M
        rows, measured)."""
        with self._lock:
            st = super().state()
            if self._centroids_h is not None:
                st["ivf_centroids"] = self._centroids_h.copy()
                rws = [self._row_of[i] for i in st["ids"]]
                st["ivf_cluster"] = self._cluster_of[rws].copy()
                st["ivf_cluster2"] = self._cluster_of2[rws].copy()
                if self._nprobe_tuned > 0:
                    # restore skips the tuning pass like it skips the
                    # k-means (the value was measured on this layout)
                    st["ivf_nprobe_tuned"] = np.int32(
                        self._nprobe_tuned)
                    st["ivf_cand_boost"] = np.int32(self._cand_boost)
                    if self._delivered_recall is not None:
                        st["ivf_delivered"] = np.float64(
                            self._delivered_recall)
                    if self._tune_curve:
                        # the probe-hit curve travels with the pick it
                        # produced, so /stats after a restore shows the
                        # measurement, not just the conclusion
                        st["ivf_tune_curve"] = np.asarray(
                            self._tune_curve, np.float64)
                if self._nbrs_h is not None:
                    # persist the kNN graph id-relative: values become
                    # positions in st["ids"] (-1 for dead/absent rows),
                    # remapped to the new row assignment at load
                    rws = np.asarray(rws, np.int64)
                    pos = np.full(self._cap, -1, np.int32)
                    pos[rws] = np.arange(len(rws), dtype=np.int32)
                    nb = self._nbrs_h[rws]
                    st["ivf_nbrs"] = np.where(
                        nb >= 0, pos[np.where(nb >= 0, nb, 0)], -1
                    ).astype(np.int32)
            return st

    # -------------------------------------------------------- bookkeeping
    def _mask_boot_hint(self, row: int) -> None:
        """Drop the snapshot-restored cluster hint for a mutated row.
        Hints are captured per ROW at load time (TpuIvfIndex.load); a
        boot-time delta replay or a pre-first-sync live write can
        change a row's vector (update) or reassign it to a different
        node entirely (remove + reuse) — packing such a row into the
        OLD vector's cluster would make it unfindable at normal nprobe
        (probes rank clusters by query-centroid proximity). Masked
        rows re-assign fresh in _build_ivf, same as out-of-bounds
        delta rows. Callers hold the corpus lock."""
        bc = self._boot_cluster
        if bc is not None and 0 <= row < len(bc):
            bc[row] = -1
        bc2 = self._boot_cluster2
        if bc2 is not None and 0 <= row < len(bc2):
            bc2[row] = -1
        bn = self._boot_nbrs
        if bn is not None and 0 <= row < len(bn):
            bn[row] = -1

    def _mask_graph_row(self, row: Optional[int]) -> None:
        """Drop a mutated row's OUT-edges: its vector changed (or the
        row was freed), so its neighbor list no longer describes it.
        Stale IN-edges pointing at the row stay — expansion re-checks
        liveness/filters and the exact re-rank scores the CURRENT
        vector, so a stale edge costs one wasted candidate, never a
        wrong result. Callers hold the corpus lock."""
        if row is None:
            return
        nb = self._nbrs_h
        if nb is not None and 0 <= row < len(nb):
            nb[row] = -1
        if self._graph_inflight:
            self._graph_stale.add(row)

    def upsert_batch(self, ids, vectors, kinds, agents) -> None:
        # the write AND the hint masking happen under ONE lock hold
        # (RLock): a concurrent search's sync() could otherwise run
        # _build_ivf in the gap, consume the still-unmasked hint (the
        # hints are one-shot) and pack the NEW vector into the OLD
        # vector's cluster
        with self._lock:
            super().upsert_batch(ids, vectors, kinds, agents)
            if (self._boot_cluster is not None
                    or self._nbrs_h is not None
                    or self._graph_inflight):
                for nid in ids:
                    r = self._row_of.get(nid)
                    if r is not None:
                        self._mask_boot_hint(r)
                        self._mask_graph_row(r)

    def remove(self, node_id: str) -> bool:
        with self._lock:
            row = self._row_of.get(node_id)
            out = super().remove(node_id)
            if out and row is not None:
                self._mask_boot_hint(row)
                self._mask_graph_row(row)
            return out

    def _grow(self, need: int) -> None:
        old = self._cap
        super()._grow(need)
        pad = self._cap - old
        if pad > 0:
            self._cluster_of = np.concatenate(
                [self._cluster_of, np.full(pad, -1, np.int32)])
            self._slot_of = np.concatenate(
                [self._slot_of, np.full(pad, -1, np.int32)])
            self._cluster_of2 = np.concatenate(
                [self._cluster_of2, np.full(pad, -1, np.int32)])
            self._slot_of2 = np.concatenate(
                [self._slot_of2, np.full(pad, -1, np.int32)])
            if self._nbrs_h is not None:
                self._nbrs_h = np.concatenate(
                    [self._nbrs_h,
                     np.full((pad, self._nbrs_h.shape[1]), -1,
                             np.int32)])
            if self._boot_nbrs is not None:
                self._boot_nbrs = np.concatenate(
                    [self._boot_nbrs,
                     np.full((pad, self._boot_nbrs.shape[1]), -1,
                             np.int32)])

    def compact(self) -> None:
        super().compact()                     # every row index moved
        self._cluster_of = np.full(self._cap, -1, np.int32)
        self._slot_of = np.full(self._cap, -1, np.int32)
        self._cluster_of2 = np.full(self._cap, -1, np.int32)
        self._slot_of2 = np.full(self._cap, -1, np.int32)
        self._ivf_dev = None                  # rebuilt on next sync
        # boot hints are keyed by ROW; compact reassigned every row,
        # so snapshot-restored cluster hints no longer line up — drop
        # them (the next build re-assigns against the boot centroids
        # or retrains, both correct)
        self._boot_cluster = None
        self._boot_cluster2 = None
        # the kNN graph is keyed AND valued by row index — both maps
        # are invalid after reassignment (and _grow during super()
        # would otherwise pad the stale array to a nonsense size);
        # rebuilt with the layout on the next sync. An in-flight
        # background build computed against pre-compact rows: seq-bump
        # discards it at swap time
        self._nbrs_h = None
        self._boot_nbrs = None
        self._graph_seq += 1
        self._graph_inflight = False

    def _auto_nlist(self, n_live: int) -> int:
        if self._nlist_cfg > 0:
            # explicit nlist is honored exactly (it never changes
            # between rebuilds, so shape stability is inherent)
            return self._round_nlist(max(1, self._nlist_cfg))
        if n_live <= 64:
            return self._round_nlist(1)
        # auto nlist tracks sqrt(N), which drifts with every rebuild —
        # shape-bucket it so consecutive rebuilds at modestly-grown
        # corpora reuse the compiled search programs
        return self._round_nlist(self._shape_bucket(int(min(
            MAX_AUTO_NLIST, max(2, round(math.sqrt(n_live)))))))

    @staticmethod
    def _shape_bucket(v: int, align: int = 8) -> int:
        """Round up to a ~12.5%-granularity rung (power-of-two-scaled
        multiples, min `align`). The [C, L, d] layout shape is baked
        into every compiled IVF search program; without bucketing, a
        mid-serving rebuild at a modestly-grown corpus (the layout
        fills its reserve and repacks every ~slack/4 inserts) lands on
        a SLIGHTLY different shape and recompiles the whole search
        family — measured as an ~80 s p95 stall through a tunneled
        device in the IVF mixed-workload soak. Bucketed, consecutive
        rebuilds reuse every program until the corpus grows ~12 %."""
        if v <= align:
            return align
        g = max(align, 1 << max(0, v.bit_length() - 4))
        return ((v + g - 1) // g) * g

    def _round_nlist(self, c: int) -> int:
        """Subclass hook: the sharded layout needs nlist divisible by
        the mesh size."""
        return c

    def _use_pallas(self, cap: int) -> bool:
        """True when searches run the Mosaic gather-score kernel: TPU
        backend, kernel enabled, and every row id / filter code exact
        in the f32 metadata encoding. The f32 ceiling (2^24 rows)
        coincides with the single-chip HBM ceiling (~16M int8 rows x
        768d ~ 12 GB), so in practice it never gates first."""
        return (PALLAS_ENABLED and self._on_tpu
                and cap < ivf_gather.MAX_F32_EXACT_ROWS)

    def _build_meta(self, rinv_sl, slot_rows, kind_sl, agent_sl
                    ) -> np.ndarray:
        """Pack per-slot metadata into the kernel's [C, 8, L] f32
        sublane layout (ops/ivf_gather.py layout contract)."""
        c, lcap = slot_rows.shape
        meta = np.zeros((c, 8, lcap), np.float32)
        meta[:, ivf_gather.META_ROW] = slot_rows
        meta[:, ivf_gather.META_KIND] = kind_sl
        meta[:, ivf_gather.META_AGENT] = agent_sl
        meta[:, ivf_gather.META_RINV] = rinv_sl
        return meta

    def _place_ivf(self, cent, emb_i8, rinv_sl, slot_rows, kind_sl,
                   agent_sl, meta) -> Tuple[jnp.ndarray, ...]:
        """Subclass hook: device placement of the built block layout
        (the sharded variant spreads the cluster axis over the mesh).
        meta is None when the Pallas path is off."""
        return (jnp.asarray(cent), jnp.asarray(emb_i8),
                jnp.asarray(rinv_sl), jnp.asarray(slot_rows),
                jnp.asarray(kind_sl), jnp.asarray(agent_sl),
                jnp.asarray(meta) if meta is not None else None)

    def _nprobe(self, c: int) -> int:
        if self._nprobe_cfg > 0:
            return min(c, self._nprobe_cfg)
        if self._nprobe_tuned > 0:            # ivf_target_recall
            return min(c, self._nprobe_tuned)
        # recall headroom over QPS, same call as _cand_count: c/16
        # measured 0.86 in-distribution recall@10 at 200k, c/8 is the
        # ~0.92+ band; latency-sensitive deployments tune it down
        return min(c, max(8, c // 8))

    # ------------------------------------------------------------- build
    def _build_ivf(self) -> None:
        """Full (re)build: train centroids on device, pack every live
        row into a cluster slot, upload the block layout. Runs under
        the corpus lock (callers: sync)."""
        rows = np.where(self._live_h)[0].astype(np.int32)
        n = len(rows)
        if n == 0:
            self._ivf_dev = None
            self._centroids_h = None
            self._cluster_of[:] = -1
            self._slot_of[:] = -1
            self._cluster_of2[:] = -1
            self._slot_of2[:] = -1
            self._cluster_free = []
            self._trained_live = 0
            self._has_spill = False
            self._nbrs_h = None
            self._graph_seq += 1          # discard in-flight builds
            self._graph_inflight = False
            self._publish_info()
            return
        data = self._emb_h[rows]              # unit-norm fp32 [N, d]
        # boot hints (snapshot-restored centroids + per-row clusters,
        # TpuIvfIndex.load) skip the k-means retrain and the full
        # assignment pass — one-shot: a real retrain (drift/rebuild)
        # always re-trains from data
        boot_cent, boot_cluster = self._boot_cent, self._boot_cluster
        boot_cluster2 = self._boot_cluster2
        self._boot_cent = None
        self._boot_cluster = None
        self._boot_cluster2 = None
        if (boot_cent is not None and boot_cluster is not None
                and boot_cent.ndim == 2
                and boot_cent.shape[1] == self.dim
                and boot_cent.shape[0]
                == self._round_nlist(boot_cent.shape[0])):
            c = boot_cent.shape[0]
            cent = np.ascontiguousarray(boot_cent, np.float32)
            # rows past the boot array's cap (inserted after load, e.g.
            # via a boot-time delta replay that grew the corpus) have
            # no hint — mask them instead of indexing out of bounds
            first = np.full(n, -1, np.int32)
            inb = rows < len(boot_cluster)
            first[inb] = boot_cluster[rows[inb]]
            miss = (first < 0) | (first >= c)
            if miss.any():                    # delta rows: assign now
                cent_dev = jnp.asarray(cent)
                mrows = np.where(miss)[0]
                step = 1 << 18
                for s in range(0, len(mrows), step):
                    sel = mrows[s:s + step]
                    a1, _, _, _ = _assign_top2(jnp.asarray(data[sel]),
                                               cent_dev)
                    first[sel] = np.asarray(a1)
            second = None                     # spill -> least-filled
            margin = None                     # boot spill: hints only
            boot_restored = True
            log.info("ivf build: snapshot-restored clustering "
                     "(%d clusters, %d rows assigned fresh)",
                     c, int(miss.sum()))
        else:
            boot_restored = False
            c = self._auto_nlist(n)
            rng = np.random.default_rng(n)    # deterministic per size
            sample = data[rng.choice(n, size=min(n, 131072),
                                     replace=False)]
            init = sample[rng.choice(len(sample), size=c,
                                     replace=len(sample) < c)]
            cent = np.asarray(_kmeans_device(
                jnp.asarray(sample), jnp.asarray(init), c=c, iters=8),
                np.float32)
            # assign every live row: best-2 clusters, chunked matmul
            first = np.empty(n, np.int32)
            second = np.empty(n, np.int32)
            margin = np.empty(n, np.float32)  # spill priority
            cent_dev = jnp.asarray(cent)
            step = 1 << 18
            for s in range(0, n, step):
                a1, a2, v1, v2 = _assign_top2(
                    jnp.asarray(data[s:s + step]), cent_dev)
                first[s:s + step] = np.asarray(a1)
                second[s:s + step] = np.asarray(a2)
                margin[s:s + step] = np.asarray(v1) - np.asarray(v2)
        # capped packing: first choice vectorized (rank-within-cluster
        # via one stable argsort — a 10M-row Python loop here would
        # cost tens of seconds); the spilled remainder (k-means
        # imbalance only) falls back to second choice, then any
        # cluster with room. C*L > N by construction, so a slot always
        # exists; a force-placed row only costs recall if its cluster
        # is never probed — the exact re-rank is unaffected.
        # slot cap is shape-bucketed like nlist: consecutive rebuilds
        # at modestly-grown corpora must reuse the compiled search
        # programs (the [C, L, d] shape is a static program parameter)
        lcap = self._shape_bucket(
            max(8, int(math.ceil(n / c * SLOT_SLACK))))
        cluster = np.empty(n, np.int32)
        slot = np.empty(n, np.int32)
        order = np.argsort(first, kind="stable")
        fs = first[order]
        starts = np.searchsorted(fs, np.arange(c))
        rank = (np.arange(n) - starts[fs]).astype(np.int32)
        ok = rank < lcap
        cluster[order[ok]] = fs[ok]
        slot[order[ok]] = rank[ok]
        fill = np.bincount(fs[ok], minlength=c).astype(np.int32)
        for j in order[~ok]:
            ch = int(second[j]) if second is not None else -1
            if ch < 0 or fill[ch] >= lcap:
                ch = int(np.argmin(fill))     # any cluster with room
            cluster[j] = ch
            slot[j] = fill[ch]
            fill[ch] += 1
        # centered int8 quantization, same invariance as the flat path
        mu = data.mean(axis=0).astype(np.float32)
        qv, rinv, self._quant_mu = quantize_rows_centered(data, mu)
        emb_i8 = np.zeros((c, lcap, self.dim), np.int8)
        rinv_sl = np.zeros((c, lcap), np.float32)
        slot_rows = np.full((c, lcap), -1, np.int32)
        kind_sl = np.full((c, lcap), PAD_CODE, np.int32)
        agent_sl = np.full((c, lcap), PAD_CODE, np.int32)
        emb_i8[cluster, slot] = qv
        rinv_sl[cluster, slot] = rinv
        slot_rows[cluster, slot] = rows
        kind_sl[cluster, slot] = self._kind_h[rows]
        agent_sl[cluster, slot] = self._agent_h[rows]
        self._cluster_of[:] = -1
        self._slot_of[:] = -1
        self._cluster_of[rows] = cluster
        self._slot_of[rows] = slot
        # --- spill packing (SOAR-style, slack-bounded): duplicate
        # boundary rows — smallest first-vs-second centroid margin —
        # into their SECOND-choice cluster's remaining free slots, so
        # a true neighbor whose home cluster ranks low against a query
        # gets a second chance to be probed. The r3 10M measurement
        # showed the recall curve FLAT in nprobe because misses are
        # exactly such rows; spilling attacks the cause instead of
        # paying 8x probes for +0.05. (Real-TEXT geometry measured the
        # opposite — nprobe-limited, +9 pts from C/8 to C/2 at 200k —
        # so `ivf_nprobe` stays the recall knob for text deployments;
        # see BASELINE.md "IVF on real-text geometry".) Costs ZERO extra HBM (the slots
        # exist as SLOT_SLACK padding); each cluster keeps
        # max(room//4, 1) spare slots in reserve for incremental
        # inserts between retrains. Duplicate candidates are masked on
        # device (_dedup_rows). Selection is vectorized like the
        # primary pack: per target cluster, smallest-margin rows win.
        self._cluster_of2[:] = -1
        self._slot_of2[:] = -1
        if self._spill > 0 and c > 1:
            if second is not None:
                sec_c, prio = second, margin
            elif boot_cluster2 is not None and len(boot_cluster2):
                sec_c = np.full(n, -1, np.int32)
                inb2 = rows < len(boot_cluster2)
                sec_c[inb2] = boot_cluster2[rows[inb2]]
                prio = np.zeros(n, np.float32)  # hint set, no margins
            else:
                sec_c = None
            if sec_c is not None:
                elig = np.where((sec_c >= 0) & (sec_c < c)
                                & (sec_c != cluster))[0]
                if len(elig):
                    room = lcap - fill
                    avail = np.floor(
                        np.maximum(0, room - np.maximum(room // 4, 1))
                        * self._spill).astype(np.int64)
                    sec = sec_c[elig]
                    o = np.lexsort((prio[elig], sec))
                    secs = sec[o]
                    st2 = np.searchsorted(secs, np.arange(c))
                    rank2 = np.arange(len(o)) - st2[secs]
                    ok2 = rank2 < avail[secs]
                    sel = elig[o[ok2]]
                    sc = secs[ok2].astype(np.int32)
                    ss = (fill[sc] + rank2[ok2]).astype(np.int32)
                    emb_i8[sc, ss] = qv[sel]
                    rinv_sl[sc, ss] = rinv[sel]
                    slot_rows[sc, ss] = rows[sel]
                    kind_sl[sc, ss] = self._kind_h[rows[sel]]
                    agent_sl[sc, ss] = self._agent_h[rows[sel]]
                    self._cluster_of2[rows[sel]] = sc
                    self._slot_of2[rows[sel]] = ss
        free_mask = slot_rows < 0
        self._cluster_free = [list(np.where(free_mask[ci])[0][::-1])
                              for ci in range(c)]
        self._centroids_h = cent
        self._slot_cap = lcap
        self._trained_live = n
        meta = (self._build_meta(rinv_sl, slot_rows, kind_sl, agent_sl)
                if self._use_pallas(self._cap) else None)
        self._ivf_dev = self._place_ivf(cent, emb_i8, rinv_sl,
                                        slot_rows, kind_sl, agent_sl,
                                        meta)
        n_spilled = int((self._cluster_of2[rows] >= 0).sum())
        self._has_spill = n_spilled > 0
        # recall-target nprobe tuning: snapshot-restored builds reuse
        # the persisted tuned value (one-shot, like the clustering
        # hints — the layout is the same one it was measured on);
        # fresh retrains re-measure on the layout just placed
        boot_np = self._boot_nprobe_tuned
        boot_curve = self._boot_tune_curve
        boot_boost = self._boot_cand_boost
        boot_delivered = self._boot_delivered
        self._boot_nprobe_tuned = 0
        self._boot_tune_curve = None
        self._boot_cand_boost = 0
        self._boot_delivered = None
        if self._target_recall <= 0.0 or self._nprobe_cfg > 0:
            self._nprobe_tuned = 0            # explicit nprobe wins
            self._tune_curve = []             # curve follows the pick
        elif boot_restored and boot_np > 0:
            self._nprobe_tuned = min(c, boot_np)
            # snapshot-restored curve (if the snapshot carried one);
            # without it the value stands alone until the next retrain
            self._tune_curve = list(boot_curve or [])
            # the delivered-recall escalation travels with the pick it
            # was measured on (same layout, same geometry)
            if boot_boost > 0:
                self._cand_boost = boot_boost
            self._delivered_recall = boot_delivered
        else:
            self._tune_nprobe(rows, data, c, emb_i8, rinv_sl,
                              slot_rows)
        # kNN-graph refinement structure (knn_graph.py): a
        # snapshot-restored graph is consumed as-is (one-shot, like
        # the clustering hints); otherwise built from the layout just
        # placed — device-resident arrays, so the build uploads
        # nothing and fetches one [C, L, R] table
        boot_nbrs = self._boot_nbrs
        self._boot_nbrs = None
        self._graph_seq += 1              # invalidate in-flight builds
        self._graph_inflight = False
        if boot_nbrs is not None and self._graph_degree > 0:
            self._nbrs_h = boot_nbrs
            log.info("ivf build: snapshot-restored kNN graph "
                     "(degree %d)", boot_nbrs.shape[1])
        elif self._graph_degree > 0 and lcap > 1:
            if c * lcap < WARM_MIN_SLOTS:
                # tiny layouts build in milliseconds — inline keeps
                # tests and small boots deterministic
                from .knn_graph import build_knn_graph
                ge, gr, gs = self._graph_build_arrays(emb_i8, rinv_sl,
                                                      slot_rows)
                self._nbrs_h = build_knn_graph(
                    ge, gr, gs, self._quant_mu,
                    degree=self._graph_degree, cap=self._cap,
                    rows=rows,
                    cluster_of=self._cluster_of, slot_of=self._slot_of,
                    cluster_of2=self._cluster_of2,
                    slot_of2=self._slot_of2)
            else:
                # serving-scale layouts: build OFF the lock on a
                # background thread (searches serve unrefined until
                # the swap — refinement is recall-additive, so the
                # gap only costs the lift, never correctness)
                self._nbrs_h = None
                self._spawn_graph_build(emb_i8, rinv_sl, slot_rows,
                                        rows)
        else:
            self._nbrs_h = None
        self._publish_info()
        log.info("ivf build: %d rows -> %d clusters x %d slots "
                 "(fill %.2f, %d spilled)", n, c, lcap, n / (c * lcap),
                 n_spilled)

    def _publish_info(self) -> None:
        """Publish the operational-state snapshot index_info() serves.
        One atomically-swapped plain dict: /stats must never queue
        behind the corpus lock for the length of a retrain (~90 s at
        10M rows), and an unlocked field-by-field read could tear
        mid-rebuild (ADVICE r3 #1) — readers get the whole pre- or
        post-build state, never a mix."""
        if self._centroids_h is None:
            self._info_pub = {"trained": False}
            return
        c = int(self._centroids_h.shape[0])
        self._info_pub = {
            "trained": True,
            "nlist": c,
            "nprobe": int(self._nprobe(c)),
            "nprobe_tuned": int(self._nprobe_tuned),
            "target_recall": float(self._target_recall),
            "tune_curve": [[int(p), round(float(r), 4)]
                           for p, r in self._tune_curve],
            # both curves: probe-hit (tune_curve) AND the end-to-end
            # number actually delivered at the published pick
            "delivered_recall": (round(float(self._delivered_recall),
                                       4)
                                 if self._delivered_recall is not None
                                 else None),
            "cand_boost": int(self._cand_boost),
            "graph_degree": int(self._graph_degree),
            "spill": bool(self._has_spill),
        }

    def _graph_build_arrays(self, emb_i8, rinv_sl, slot_rows):
        """Layout planes the kNN-graph build reads: the DEVICE-resident
        copies just placed (zero upload; the build slices chunks
        on-device). The sharded subclass overrides with the host
        copies — dynamic_slice across a NamedSharding'd cluster axis
        would all-gather the layout."""
        return self._ivf_dev[1], self._ivf_dev[2], self._ivf_dev[3]

    def _tune_nprobe(self, rows: np.ndarray, data: np.ndarray,
                     c: int, emb_i8, rinv_sl, slot_rows) -> None:
        """Measure the probe-hit curve on the corpus itself and set
        the smallest ladder nprobe whose sampled candidate recall@10
        meets [embedding] ivf_target_recall.

        Method: sample corpus rows as self-queries; compute each
        sample's true top-10 (by the layout's own int8-descaled
        scoring — the best the candidate generator can produce at
        full probe, one chunked pass over the [C, L, d] planes); rank
        clusters per query exactly as the serving kernel does (raw
        fp32 q . centroids); a truth row is 'hit at p' when its home
        OR spill cluster ranks inside the top p. recall(p) then needs
        no extra searches — one [S, C] matmul plus host rank lookups.
        The chosen p is a ladder rung (C/64..C/2, C — discrete, so a
        retrain at the same shape-bucketed C reuses every compiled
        search program). Runs under the corpus lock at (re)train time;
        cost is ~one corpus pass for TUNE_SAMPLES queries. Probe-hit
        bounds candidate recall from above, but candidate width was
        measured non-binding (cand 64 -> 512 moved recall not at all,
        BASELINE.md 10M findings), so the bound is tight in practice.
        Geometry evidence for WHY this must be measured, not guessed:
        BASELINE.md 'IVF on real-text geometry'."""
        self._nprobe_tuned = 0
        self._tune_curve = []   # never report a stale layout's curve
        self._cand_boost = 1    # re-measured per layout
        self._delivered_recall = None
        n = len(rows)
        if c <= 8 or n < 4 * TUNE_TRUTH_K:
            return                            # trivial layouts: auto
        from .shard import _fetch_array
        rng = np.random.default_rng(n ^ 0x5EED)
        s = min(TUNE_SAMPLES, n)
        pick = rng.choice(n, size=s, replace=False)
        q = np.ascontiguousarray(data[pick], np.float32)  # [S, d]
        qrows = rows[pick]
        ge, gr, gs = self._graph_build_arrays(emb_i8, rinv_sl,
                                              slot_rows)
        # exact top-k truth, chunk-wise over the cluster axis: fixed
        # chunk shape (the last chunk slides back and overlaps; host
        # merge dedups), so the pass compiles ONE program. Chunk size
        # bounds the transient HBM of BOTH the int8 chunk (L*d bytes
        # per cluster) and the [S, cc*L] fp32 score plane (4*S per
        # slot)
        L = int(ge.shape[1])
        per_cluster = L * (self.dim + 4 * s)
        cc = max(1, min(c, GATHER_BUDGET_BYTES // max(1, per_cluster)))
        k_chunk = min(cc * L, 2 * TUNE_TRUTH_K + 12)  # dup/self margin
        vs, rs = [], []
        q_dev = jnp.asarray(q)
        for c0 in range(0, c, cc):
            c0 = min(c0, c - cc)
            v, r = _tune_chunk_topk(ge[c0:c0 + cc], gr[c0:c0 + cc],
                                    gs[c0:c0 + cc], q_dev, k=k_chunk)
            vs.append(_fetch_array(v))
            rs.append(_fetch_array(r))
        v = np.concatenate(vs, axis=1)        # [S, nchunk*k]
        r = np.concatenate(rs, axis=1)
        order = np.argsort(-v, axis=1, kind="stable")
        v = np.take_along_axis(v, order, axis=1)
        r = np.take_along_axis(r, order, axis=1)
        # per query: drop self + spill/overlap duplicates, keep top-10
        truth = np.full((s, TUNE_TRUTH_K), -1, np.int64)
        for i in range(s):
            seen: set = {int(qrows[i])}
            t = 0
            for j in range(r.shape[1]):
                if v[i, j] <= NEG_INF / 2:
                    break
                row = int(r[i, j])
                if row in seen:
                    continue
                seen.add(row)
                truth[i, t] = row
                t += 1
                if t == TUNE_TRUTH_K:
                    break
        valid = truth >= 0
        total = int(valid.sum())
        if total == 0:
            return
        # serving probe order (matches _ivf_search: fp32 q . cent^T)
        cs = q @ self._centroids_h.T          # [S, C]
        crank = np.empty((s, c), np.int64)
        np.put_along_axis(
            crank, np.argsort(-cs, axis=1, kind="stable"),
            np.broadcast_to(np.arange(c, dtype=np.int64), (s, c)),
            axis=1)
        tr = np.where(valid, truth, 0)
        cl1 = self._cluster_of[tr]
        cl2 = self._cluster_of2[tr]
        r1 = np.take_along_axis(crank, np.clip(cl1, 0, c - 1).astype(
            np.int64), axis=1)
        r1 = np.where(cl1 >= 0, r1, c)
        r2 = np.take_along_axis(crank, np.clip(cl2, 0, c - 1).astype(
            np.int64), axis=1)
        r2 = np.where(cl2 >= 0, r2, c)
        pr = np.sort(np.minimum(r1, r2)[valid])
        # rungs: C/64..C/2 by doubling, then 3C/4, then C. The 3C/4
        # rung exists because real-text curves measured a hole there
        # (hardware r4: probe-hit 0.87-0.89 at C/2 jumping to 1.0 at
        # C on both text corpora) — without it any target above the
        # C/2 reading pays FULL probe; with it, ~25% less work when
        # the curve crosses the target in between
        ladder = sorted({max(8, c >> i) for i in range(6, 0, -1)}
                        | {(3 * c) // 4, c})
        curve = [(p, np.searchsorted(pr, p, side="left") / total)
                 for p in ladder if p <= c]
        chosen = c
        for p, rec in curve:
            if rec >= self._target_recall:
                chosen = p
                break
        self._nprobe_tuned = chosen
        # the measured curve is worth more than the single pick it
        # produced: diagnostics (semantic_recall_study) read it to
        # report the pick for EVERY target from one tuning pass
        self._tune_curve = [(int(p), float(rec)) for p, rec in curve]
        log.info(
            "ivf nprobe tune: target %.3f -> nprobe %d/%d "
            "(auto would be %d; sampled probe-hit curve %s)",
            self._target_recall, chosen, c, max(8, c // 8),
            [(p, round(float(rec), 4)) for p, rec in curve])
        # end-to-end cross-check (VERDICT r4 #4): probe-hit only
        # UPPER-bounds delivered recall — hash-text measured 0.973
        # end-to-end at probe-hit 1.0 (int8 candidate-boundary noise
        # at the default width; BASELINE r4 tuner finding 3). Measure
        # recall@10 through the REAL serving dispatch (int8 candidate
        # scan at the chosen rung + exact fp32 re-rank) and escalate
        # the candidate width one rung (x2, up to x4) while it misses
        # the target AND widening keeps helping — a residual that
        # widening does not move is not candidate-bound, so the extra
        # QPS cost is refunded by reverting the last rung.
        delivered = self._measure_delivered(q, qrows, truth, valid)
        while (delivered is not None
               and delivered < self._target_recall - 1e-9
               and self._cand_boost < 4):
            self._cand_boost *= 2
            re_meas = self._measure_delivered(q, qrows, truth, valid)
            log.info("ivf tune: delivered recall %.4f < target %.3f "
                     "-> cand width x%d (re-measured %.4f)",
                     delivered, self._target_recall, self._cand_boost,
                     -1.0 if re_meas is None else re_meas)
            if re_meas is None or re_meas <= delivered + 1e-9:
                self._cand_boost //= 2        # not candidate-bound
                break
            delivered = re_meas
        self._delivered_recall = delivered

    def _measure_delivered(self, q: np.ndarray, qrows: np.ndarray,
                           truth: np.ndarray,
                           valid: np.ndarray) -> Optional[float]:
        """Delivered recall@10 on the tuner's sample through the REAL
        serving path: _dispatch_search at the currently-tuned
        nprobe/cand (the same fused kernel queries hit) + exact fp32
        re-rank on the host mirror, self-row excluded like the truth
        set. Returns None when the dispatch fails (e.g. wedged
        device) — the tuner then keeps the probe-hit pick."""
        try:
            from .shard import _fetch_array
            s = q.shape[0]
            ak, aa, ex, hb = self._filter_codes(None, None, None)
            _, kb = self._k_bucket(TUNE_TRUTH_K)
            b_bucket = 1
            while b_bucket < s:
                b_bucket *= 2
            q_np = q if b_bucket == s else np.concatenate(
                [q, np.zeros((b_bucket - s, self.dim), np.float32)])
            _, rows, _ = self._dispatch_search(
                jnp.asarray(q_np), ak, aa, ex, kb, host_bias=hb)
            rows_h = np.asarray(_fetch_array(rows))[:s]
            hits = 0
            total = 0
            for i in range(s):
                cand = np.unique(rows_h[i][rows_h[i] >= 0])
                if cand.size == 0:
                    continue
                sc = self._emb_h[cand] @ q[i]
                sc = np.where(cand == int(qrows[i]), -np.inf, sc)
                top = set(cand[np.argsort(-sc)[:TUNE_TRUTH_K]]
                          .tolist())
                t = truth[i][valid[i]]
                total += len(t)
                hits += sum(1 for r_ in t if int(r_) in top)
            return hits / total if total else None
        except Exception:  # noqa: BLE001 — keep the probe-hit pick
            log.warning("ivf tune: delivered-recall measurement "
                        "failed; keeping the probe-hit pick",
                        exc_info=True)
            return None

    def _spawn_graph_build(self, emb_i8, rinv_sl, slot_rows,
                           rows: np.ndarray) -> None:
        """Background kNN-graph build for serving-scale layouts.
        Captures the HOST layout arrays (the _build_ivf locals — the
        device copies are DONATED by incremental slot scatters, so a
        background read of them would abort on every write wave) plus
        COPIES of the per-row placement maps, builds off the lock
        (build_knn_graph chunk-uploads numpy inputs), and swaps the
        table in under the lock iff no rebuild/compact superseded it
        (seq check). Rows mutated while the build was in flight get
        their out-edges masked at swap (_graph_stale). Any failure
        leaves the graph off until the next rebuild — refinement is
        additive, so absence costs lift, never correctness. Callers
        hold the corpus lock."""
        import threading

        from .shard import DeviceFetchTimeout, _donated_buffer_race, \
            _fetch_array
        from .knn_graph import build_knn_graph

        seq = self._graph_seq
        self._graph_inflight = True
        self._graph_stale = set()
        ge, gr, gs = emb_i8, rinv_sl, slot_rows   # host numpy
        mu = self._quant_mu
        cap = self._cap
        cl1, sl1 = self._cluster_of.copy(), self._slot_of.copy()
        cl2, sl2 = self._cluster_of2.copy(), self._slot_of2.copy()
        deg = self._graph_degree

        def run():
            try:
                out = build_knn_graph(
                    ge, gr, gs, mu, degree=deg, cap=cap, rows=rows,
                    cluster_of=cl1, slot_of=sl1, cluster_of2=cl2,
                    slot_of2=sl2, fetch=_fetch_array)
            except DeviceFetchTimeout:
                log.warning("background knn-graph build fetch wedged; "
                            "graph stays off until the next rebuild")
                out = None
            except Exception as e:  # noqa: BLE001 — classified below
                if _donated_buffer_race(e):
                    log.info("background knn-graph build raced a "
                             "donating scatter; graph stays off until "
                             "the next rebuild")
                else:
                    log.exception("background knn-graph build failed")
                out = None
            with self._lock:
                if seq != self._graph_seq:
                    return                # superseded: discard
                self._graph_inflight = False
                if out is None:
                    return
                for r in self._graph_stale:
                    if 0 <= r < len(out):
                        out[r] = -1
                if len(out) < self._cap:  # corpus grew mid-build
                    out = np.concatenate(
                        [out, np.full((self._cap - len(out),
                                       out.shape[1]), -1, np.int32)])
                self._nbrs_h = out
                log.info("knn graph swapped in (background build, "
                         "%d stale rows masked)", len(self._graph_stale))

        threading.Thread(target=run, daemon=True,
                         name="ivf-graph-build").start()

    def _free_slots(self) -> int:
        return sum(len(f) for f in self._cluster_free)

    def _grow_slots(self) -> bool:
        """Extend the slot axis to the next shape rung IN HBM when
        incremental placement runs out of room — the IVF analog of
        shard's device growth. The old path fell back to a full
        retrain + re-upload whose transfer measured ~20-30 s inside
        the corpus lock through a tunneled device (the residual p99
        event in the IVF mixed-workload soak). Cluster assignments
        are untouched (clustering quality drift stays bounded by the
        RETRAIN_GROWTH rebuild); the [C, L, d] shape change
        recompiles the search family, which warm_next_slot_programs
        pre-lowers in the background. Callers hold the corpus lock.
        Returns False when no layout exists, the rung can't grow, or
        the grown layout would exceed the HBM budget (the transient
        peak during the donating concat is old + new)."""
        ivf = self._ivf_dev
        if ivf is None or self._slot_cap <= 0:
            return False
        cent, emb_i8, rinv_sl, slot_rows, kind_sl, agent_sl, meta = ivf
        c = emb_i8.shape[0]
        l = self._slot_cap
        l2 = self._shape_bucket(l + 1)
        pad = l2 - l
        if pad <= 0:
            return False
        # per-slot bytes: int8 emb + 4 f32/i32 aux planes + the [C,8,L]
        # f32 meta plane when the Pallas path is on — each transiently
        # double-buffered during its donating concat
        per_slot = self.dim + 16 + (32 if meta is not None else 0)
        if c * (l + l2) * per_slot > self._hbm_budget:
            return False                      # transient peak too big
        try:
            arrs = _pad_slot_axis(emb_i8, rinv_sl, slot_rows, kind_sl,
                                  agent_sl, pad=pad)
            meta = _pad_meta_axis(meta, pad=pad) if meta is not None \
                else None
        except Exception:   # noqa: BLE001 — donation is not atomic
            # the pads DONATE the layout planes: a failure partway
            # (OOM, compile error) can leave the published tuple
            # pointing at deleted buffers, which every retry would
            # recapture — drop the layout so sync() rebuilds from the
            # host state (the source of truth) instead
            log.exception("ivf slot growth failed; layout dropped "
                          "for rebuild")
            self._ivf_dev = None
            return False
        self._ivf_dev = (cent, *arrs, meta)
        for f in self._cluster_free:
            f.extend(range(l, l2))
        self._slot_cap = l2
        log.info("ivf slot growth: %d -> %d slots/cluster (in HBM, "
                 "assignments kept)", l, l2)
        return True

    #: per-search-fn positions of the slot axis in the arg spec:
    #: {arg index: axis} — used to re-lower recorded programs at the
    #: next slot rung
    _L_AXES = {"xla": {1: 1, 2: 1, 3: 1, 4: 1, 5: 1},
               "xla_hb": {1: 1, 2: 1, 3: 1},
               "pallas": {1: 1, 2: 2},
               "pallas_hb": {1: 1, 2: 2}}

    def _log_search(self, name: str, args: tuple, k_bucket: int,
                    statics: dict) -> None:
        """Record a dispatched search program's recipe (shapes +
        statics) so warm_next_slot_programs can re-lower it at the
        next slot rung. Cheap (one tuple build); the dict is bounded
        by the distinct program set XLA already caches."""
        spec = tuple((tuple(a.shape), str(a.dtype)) for a in args)
        key = (name, spec, k_bucket,
               tuple(sorted(statics.items())))
        self._search_log.setdefault(key, self._slot_cap)

    def warm_next_slot_programs(self, *, pace_s: float = 0.0) -> int:
        """Shape-only AOT compile of every RECORDED search program at
        the NEXT slot rung, plus the growth-pad programs themselves —
        so a _grow_slots crossing finds its whole program family
        already compiled instead of paying a mid-serving compile
        storm (~20-40 s per program through a tunneled device).
        Compiles run outside the corpus lock. Returns the number of
        programs lowered."""
        import time as _time
        fns = {"xla": _ivf_search, "xla_hb": _ivf_search_hostbias,
               "pallas": _ivf_search_pallas,
               "pallas_hb": _ivf_search_pallas_hostbias}
        shapes, meta_shape = self._layout_shapes()  # no array refs
        if (shapes is not None
                and shapes[0].shape[0] * shapes[0].shape[1]
                < WARM_MIN_SLOTS):
            return 0        # tiny layout: crossings are cheap
        with self._lock:
            l = self._slot_cap
            # prune recipes recorded at OTHER slot rungs: after a
            # growth/rebuild they can never be dispatched again, and
            # re-lowering them verbatim on every warm pass burns a
            # full XLA compile each (~20-40 s through a tunneled
            # device) for a dead program
            stale = [k for k, rec_l in self._search_log.items()
                     if rec_l != l]
            for k in stale:
                del self._search_log[k]
            entries = list(self._search_log.items())
        if shapes is None or l <= 0:
            return 0
        l2 = self._shape_bucket(l + 1)
        if l2 <= l:
            return 0
        S = jax.ShapeDtypeStruct
        done = 0
        for (name, spec, k_bucket, st), _ in entries:
            axes = self._L_AXES[name]
            try:
                structs = []
                for idx, (shape, dtype) in enumerate(spec):
                    shape = list(shape)
                    ax = axes.get(idx)
                    if ax is not None and shape[ax] == l:
                        shape[ax] = l2
                    structs.append(S(tuple(shape), jnp.dtype(dtype)))
                st = dict(st)
                st["cand"] = min(self._cand_count(k_bucket)
                                 * self._cand_boost, st["p"] * l2)
                fns[name].lower(*structs, **st).compile()
                done += 1
                if pace_s:
                    _time.sleep(pace_s)
            except Exception:   # noqa: BLE001 — warm is best-effort
                log.debug("ivf next-slot warm failed for %s", name,
                          exc_info=True)
        # the growth pads themselves...
        try:
            _pad_slot_axis.lower(*shapes, pad=l2 - l).compile()
            if meta_shape is not None:
                _pad_meta_axis.lower(meta_shape, pad=l2 - l).compile()
            done += 1
        except Exception:   # noqa: BLE001
            log.debug("ivf pad-program warm failed", exc_info=True)
        # ... and the donating-scatter family at the GROWN shape: the
        # growth fires mid-_apply_dirty and the same call immediately
        # scatters at [C, l2, d] — left cold, that first write wave
        # pays the compile inside the corpus lock
        grown = tuple(
            S((s.shape[0], l2) + s.shape[2:], s.dtype)
            for s in shapes)
        grown_meta = (None if meta_shape is None else
                      S(meta_shape.shape[:2] + (l2,), meta_shape.dtype))
        self._lower_scatter_family(grown, grown_meta, pace_s=pace_s)
        done += 1
        return done

    def _apply_dirty(self, rows: np.ndarray) -> bool:
        """Incremental slot maintenance for dirty rows. Returns False
        when placement ran out of room (caller falls back to a full
        rebuild).

        Writes are keyed by (cluster, slot), LAST WINS: a slot vacated
        by one row can be taken by a later row in the same batch, and
        XLA scatter with duplicate indices does not define which write
        lands — so duplicates must be resolved on the host before the
        single device scatter."""
        writes: dict = {}                     # (c, s) -> global row | -1
        live_mask = self._live_h[rows]
        live_rows = rows[live_mask]
        # one BLAS matmul for every live-dirty row's cluster preference
        # (a per-row matvec loop is ~GFLOPs of Python-paced work at
        # linker-cycle sizes)
        pref = None
        if len(live_rows):
            sc = self._emb_h[live_rows] @ self._centroids_h.T
            take = min(8, sc.shape[1])
            pref = np.argsort(-sc, axis=1)[:, :take]
        li = 0
        for r in rows:
            # a dirty row's SPILL copy is always dropped: a delete must
            # not leave a live-looking duplicate slot, and an update's
            # stale int8 copy would keep scoring the old embedding.
            # Spill copies are only (re)created at build time.
            cl2, sl2 = int(self._cluster_of2[r]), int(self._slot_of2[r])
            if sl2 >= 0:
                writes[(cl2, sl2)] = -1
                self._cluster_free[cl2].append(sl2)
                self._cluster_of2[r] = -1
                self._slot_of2[r] = -1
            cl, sl = int(self._cluster_of[r]), int(self._slot_of[r])
            if not self._live_h[r]:
                if sl >= 0:                   # clear the vacated slot
                    writes[(cl, sl)] = -1
                    self._cluster_free[cl].append(sl)
                    self._cluster_of[r] = -1
                    self._slot_of[r] = -1
                continue
            choices = pref[li]
            li += 1
            best = int(choices[0])
            if cl == best and sl >= 0:
                target_c, target_s = cl, sl   # in-place value update
            else:
                target_c = -1
                for ch in choices:            # nearest with room
                    if self._cluster_free[int(ch)]:
                        target_c = int(ch)
                        break
                if target_c < 0:              # any room at all?
                    for ch, f in enumerate(self._cluster_free):
                        if f:
                            target_c = ch
                            break
                if target_c < 0:
                    # every slot taken: grow the slot axis in HBM
                    # (assignments kept, ~ms) before falling back to
                    # the full retrain + re-upload rebuild
                    if not self._grow_slots():
                        return False          # full: rebuild
                    target_c = best
                target_s = self._cluster_free[target_c].pop()
                if sl >= 0:                   # vacate the old slot
                    writes[(cl, sl)] = -1
                    self._cluster_free[cl].append(sl)
                self._cluster_of[r] = target_c
                self._slot_of[r] = target_s
            writes[(target_c, target_s)] = int(r)
        if not writes:
            return True
        c_all = np.fromiter((c for c, _ in writes), np.int32)
        s_all = np.fromiter((s for _, s in writes), np.int32)
        sr_all = np.fromiter(writes.values(), np.int32)
        # chunk to a bounded bucket, then pad each chunk to a power of
        # two by repeating its first write (idempotent: duplicate
        # (c, s) carry identical values) — same compile-churn guard as
        # the flat path, and the bound makes the whole program family
        # {1, 2, ..., MAX_SCATTER_ROWS} pre-compilable shape-only
        # (warm_scatter_buckets); an unbounded wave would compile a
        # fresh donating scatter mid-serving. (c, s) keys are unique
        # across chunks, so any application order is equivalent.
        for s0 in range(0, len(c_all), MAX_SCATTER_ROWS):
            c_idx, s_idx, sr = _pad_pow2(
                c_all[s0:s0 + MAX_SCATTER_ROWS],
                s_all[s0:s0 + MAX_SCATTER_ROWS],
                sr_all[s0:s0 + MAX_SCATTER_ROWS])
            dead = sr < 0
            src = np.where(dead, 0, sr)       # dead slots: value ignored
            qv, ri, _ = quantize_rows_centered(self._emb_h[src],
                                               self._quant_mu)
            ri = np.where(dead, 0.0, ri).astype(np.float32)
            qv[dead] = 0
            kc = np.where(dead, PAD_CODE,
                          self._kind_h[src]).astype(np.int32)
            ac = np.where(dead, PAD_CODE,
                          self._agent_h[src]).astype(np.int32)
            cent, *arrs, meta = self._ivf_dev
            try:
                if meta is not None:
                    meta = _scatter_meta(meta, jnp.asarray(c_idx),
                                         jnp.asarray(s_idx),
                                         jnp.asarray(sr),
                                         jnp.asarray(kc),
                                         jnp.asarray(ac),
                                         jnp.asarray(ri))
                self._ivf_dev = (cent, *_scatter_slots(
                    *arrs, jnp.asarray(c_idx), jnp.asarray(s_idx),
                    jnp.asarray(qv), jnp.asarray(ri), jnp.asarray(sr),
                    jnp.asarray(kc), jnp.asarray(ac)), meta)
            except Exception:   # noqa: BLE001 — donation is not atomic
                # _scatter_meta may have donated the meta plane before
                # _scatter_slots raised: the published tuple could hold
                # dead buffers that every search retry would recapture.
                # Drop the layout; the caller's rebuild restores it
                # from host state.
                log.exception("ivf slot scatter failed; layout "
                              "dropped for rebuild")
                self._ivf_dev = None
                return False
        return True

    def _layout_shapes(self):
        """(aux-plane ShapeDtypeStructs, meta struct or None) of the
        CURRENT layout — built under the lock, holding NO array refs
        (a compile loop pinning the multi-GB layout would keep the old
        copy alive across a concurrent rebuild's functional swap —
        transiently two full layouts in HBM)."""
        with self._lock:
            ivf = self._ivf_dev
            if ivf is None:
                return None, None
            shapes = tuple(jax.ShapeDtypeStruct(a.shape, a.dtype)
                           for a in ivf[1:6])
            meta_shape = (None if ivf[6] is None else
                          jax.ShapeDtypeStruct(ivf[6].shape,
                                               ivf[6].dtype))
        return shapes, meta_shape

    def _lower_scatter_family(self, shapes, meta_shape, *,
                              pace_s: float = 0.0) -> None:
        """Shape-only lower+compile of the donating scatter programs
        for every power-of-two write bucket at the given layout
        shapes."""
        import time as _time
        S = jax.ShapeDtypeStruct
        d = self.dim
        b = 1
        while b <= MAX_SCATTER_ROWS:
            iv = S((b,), jnp.int32)
            try:
                _scatter_slots.lower(
                    *shapes, iv, iv, S((b, d), jnp.int8),
                    S((b,), jnp.float32), iv, iv, iv).compile()
                if meta_shape is not None:
                    _scatter_meta.lower(
                        meta_shape, iv, iv, iv, iv, iv,
                        S((b,), jnp.float32)).compile()
                if pace_s:
                    _time.sleep(pace_s)
            except Exception:   # noqa: BLE001 — warm is best-effort
                log.debug("ivf scatter warm failed at bucket %d", b,
                          exc_info=True)
            b *= 2

    def warm_scatter_buckets(self, *, pace_s: float = 0.0) -> bool:
        """Shape-only AOT compile of the incremental-scatter program
        family at the CURRENT layout shape ([C, L, d] and every
        power-of-two write bucket up to MAX_SCATTER_ROWS). The flat
        path warms its scatter buckets by re-scattering live rows (a
        semantic no-op there); for IVF a real dirty pass drops rows'
        spill copies, so the warm must be shape-only. No HBM is
        allocated — results land in the jit dispatch cache. Returns
        False when no layout is built yet."""
        shapes, meta_shape = self._layout_shapes()
        if shapes is None:
            return False
        if shapes[0].shape[0] * shapes[0].shape[1] < WARM_MIN_SLOTS:
            return False    # tiny layout: not worth ~22 tunnel compiles
        self._lower_scatter_family(shapes, meta_shape, pace_s=pace_s)
        with self._lock:
            self._scatter_warmed = shapes[0].shape
        return True

    def _maybe_warm_scatter(self, shape: tuple) -> None:
        """Background shape-only scatter warm when the layout shape
        has no compiled program family yet — fired from search
        dispatches (serving phases), never from the bulk-build path
        (build-storm warms were measured to slow the flat path's bulk
        seed 229 s -> 569 s; the same caution applies here). DELAYED
        and PACED like the flat path's growth warm-ahead: an immediate
        compile burst from a boot-time search overlaps boot warmup's
        own compiles, and concurrent compile RPCs from two threads
        head-of-line-block a tunneled device (the observed wedge
        pattern). Boot warmup's synchronous warm usually covers the
        shape first and the delayed thread exits without compiling."""
        from .shard import _SHUTDOWN, _WARM_THREADS
        if self._scatter_warm_pending or _SHUTDOWN.is_set():
            return
        if shape[0] * shape[1] < WARM_MIN_SLOTS:
            return      # tiny layout: rebuilds/compiles are cheap and
            #             the warm's compile RPCs would block serving
        with self._lock:
            if (self._scatter_warm_pending
                    or self._scatter_warmed == shape):
                return
            self._scatter_warm_pending = True
        delay = float(os.environ.get("CORTEX_GROWTH_WARM_DELAY_S", "45"))

        def run():
            try:
                if _SHUTDOWN.wait(delay):
                    return
                with self._lock:
                    fresh = self._scatter_warmed != shape
                if fresh:          # not warmed while we slept
                    self.warm_scatter_buckets(pace_s=0.25)
                if not _SHUTDOWN.is_set():
                    # stay one slot rung ahead: a placement-full
                    # growth must find its search family compiled
                    self.warm_next_slot_programs(pace_s=0.25)
            except Exception:   # noqa: BLE001 — warm is best-effort
                log.debug("background ivf scatter warm failed",
                          exc_info=True)
            finally:
                self._scatter_warm_pending = False

        import threading
        t = threading.Thread(target=run, daemon=True,
                             name="cortex-ivf-scatter-warm")
        _WARM_THREADS.add(t)
        t.start()

    def sync(self) -> None:
        """Push host diffs into the block layout; full rebuild (with
        retrain) when the structure is stale, absent, or drifted."""
        with self._lock:
            if self._cap == 0:
                return
            n_live = int(self._live_h.sum())
            stale = (self._ivf_dev is None and n_live > 0)
            drifted = (self._trained_live > 0 and
                       (n_live > RETRAIN_GROWTH * self._trained_live
                        or n_live * RETRAIN_GROWTH < self._trained_live))
            bulk = len(self._dirty) > max(4096, self._cap // 8)
            if self._full_resync or stale or drifted or bulk:
                self._build_ivf()
                self._full_resync = False
                self._dirty.clear()
                return
            if not self._dirty:
                return
            rows = np.fromiter(self._dirty, np.int32)
            if not self._apply_dirty(rows):
                self._build_ivf()
            self._dirty.clear()

    # ------------------------------------------------------------- search
    def _expand_candidates(self, i, valid, q_np, flt):
        """Graph refinement (knn_graph.py): widen the device candidate
        list with the kNN-graph neighbors of its top REFINE_FRONTIER
        entries before the exact re-rank. Targets the measured
        structural miss — true top-k rows whose clusters rank low
        against the query centroid are reached through a FOUND
        neighbor's edge instead of a probe. Expanded rows are
        filter-checked against the host metadata mirrors (the device
        bias never saw them) and deduped; the exact re-rank then scores
        everything fp32-true, so refinement can only add recall.
        REFINE_HOPS >= 2 re-expands from the exact-scored top of each
        hop's additions. Runs under the corpus lock."""
        nbrs = self._nbrs_h
        if nbrs is None or REFINE_FRONTIER <= 0 or REFINE_HOPS <= 0:
            return i, valid
        kinds, agent, exclude_ids = flt if flt else (None, None, None)
        codes = acode = ex_rows = None
        if kinds is not None:
            codes = np.asarray([self.kinds.lookup(kk) for kk in kinds],
                               np.int32)
        if agent is not None:
            acode = self.agents.lookup(agent)
        if exclude_ids:
            ex_rows = np.asarray(
                [self._row_of[x] for x in exclude_ids
                 if x in self._row_of], np.int32)
        b = i.shape[0]
        e = min(REFINE_FRONTIER, i.shape[1])
        r = nbrs.shape[1]
        # device candidates arrive desc-sorted by int8 score
        front_i, front_v = i[:, :e], valid[:, :e]
        parts_i, parts_v = [i], [valid]
        for hop in range(REFINE_HOPS):
            ext = nbrs[np.where(front_v, front_i, 0)].reshape(b, -1)
            ok = np.repeat(front_v, r, axis=1) & (ext >= 0)
            ext = np.where(ok, ext, 0)
            ok &= self._live_h[ext]
            if codes is not None:
                ok &= np.isin(self._kind_h[ext], codes)
            if acode is not None:
                ok &= self._agent_h[ext] == acode
            if ex_rows is not None and len(ex_rows):
                ok &= ~np.isin(ext, ex_rows)
            parts_i.append(ext)
            parts_v.append(ok)
            if hop + 1 < REFINE_HOPS:
                # next frontier: exact top-e among this hop's additions
                g = self._emb_h[ext.reshape(-1)].reshape(
                    b, -1, self.dim)
                sc = np.matmul(g, q_np[:, :, None])[:, :, 0]
                sc = np.where(ok, sc, NEG_INF)
                sel = np.argsort(-sc, axis=1)[:, :e]
                front_i = np.take_along_axis(ext, sel, axis=1)
                front_v = (np.take_along_axis(ok, sel, axis=1)
                           & (np.take_along_axis(sc, sel, axis=1)
                              > -1e29))
        i2 = np.concatenate(parts_i, axis=1)
        v2 = np.concatenate(parts_v, axis=1)
        # dedup: a neighbor already in the candidate list (or reached
        # via two frontier rows) must not surface twice in the final
        # top-k. Keep-first = the original device candidate wins over
        # its expansion duplicates.
        from .knn_graph import dedup_keep_first
        return i2, dedup_keep_first(i2, v2)

    def _dispatch_search(self, q, ak, aa, ex, k_bucket: int,
                         host_bias=None, dev=None, dev_q=None):
        """Fused IVF kernel; returns (values, GLOBAL rows, True) so the
        inherited _finish_topk re-ranks candidates exactly against the
        fp32 host mirror. A donating slot scatter that raced this
        dispatch invalidates the captured tuple — the runtime rejects
        it loudly and the caller's _donated_buffer_race retry
        recaptures; row-reassignment races are caught by the inherited
        generation check."""
        ivf = self._ivf_dev
        if ivf is None:                       # empty corpus
            b = q.shape[0]
            return (jnp.full((b, k_bucket), NEG_INF, jnp.float32),
                    jnp.zeros((b, k_bucket), jnp.int32), False)
        cent, emb_i8, rinv_sl, slot_rows, kind_sl, agent_sl, meta = ivf
        if tuple(emb_i8.shape) != self._scatter_warmed:
            self._maybe_warm_scatter(tuple(emb_i8.shape))
        c = cent.shape[0]
        p = self._nprobe(c)
        cand = min(self._cand_count(k_bucket) * self._cand_boost,
                   p * self._slot_cap)
        dd = self._has_spill                  # compile dedup out when
        if meta is not None:                  # Mosaic gather-score path
            if host_bias is not None:
                fn, name = _ivf_search_pallas_hostbias, "pallas_hb"
                args = (cent, emb_i8, meta, jnp.asarray(host_bias), q)
                statics = dict(p=p, cand=cand, dedup=dd)
            else:
                filtered = bool(ak[0] != NO_FILTER or aa != NO_FILTER
                                or ex[0] != NO_FILTER)
                fn, name = _ivf_search_pallas, "pallas"
                args = (cent, emb_i8, meta, ak, aa, ex, q)
                statics = dict(p=p, cand=cand, filtered=filtered,
                               dedup=dd)
        elif host_bias is not None:
            fn, name = _ivf_search_hostbias, "xla_hb"
            args = (cent, emb_i8, rinv_sl, slot_rows,
                    jnp.asarray(host_bias), q)
            statics = dict(p=p, cand=cand, dedup=dd)
        else:
            fn, name = _ivf_search, "xla"
            args = (cent, emb_i8, rinv_sl, slot_rows, kind_sl,
                    agent_sl, ak, aa, ex, q)
            statics = dict(p=p, cand=cand, dedup=dd)
        self._log_search(name, args, k_bucket, statics)
        v, rows = fn(*args, **statics)
        if v.shape[1] < k_bucket:
            # tiny probed pool (nprobe*L < k bucket): pad so the
            # inherited numpy rescore still returns [B, >=kk] columns
            # (the native rerank pads internally; the numpy leg's
            # kk<k pad assumes at least kk candidate columns)
            pad = k_bucket - v.shape[1]
            v = jnp.pad(v, ((0, 0), (0, pad)), constant_values=NEG_INF)
            rows = jnp.pad(rows, ((0, 0), (0, pad)))
        return v, rows, True


class TpuIvfIndex(TpuFlatIndex):
    """Drop-in VectorIndex over IvfCorpus — selected with
    [embedding] index = "ivf" for 10M+ corpora where small-batch
    latency matters more than the flat scan's recall-by-construction.
    retrain() forces a full k-means rebuild (reference rebuild()
    analog for a drifted corpus)."""

    def __init__(self, dim: int, *, nlist: int = 0, nprobe: int = 0,
                 spill: float = 1.0, storage_dtype: str = "float32",
                 search_path: str = "auto", graph_degree: int = 32,
                 target_recall: float = 0.0):
        self.dim = dim
        self._corpus = IvfCorpus(dim, nlist=nlist, nprobe=nprobe,
                                 spill=spill,
                                 storage_dtype=storage_dtype,
                                 search_path=search_path,
                                 graph_degree=graph_degree,
                                 target_recall=target_recall)
        self._delta_ids: set = set()

    def retrain(self) -> None:
        with self._corpus._lock:
            self._corpus._full_resync = True
            self._corpus._boot_cent = None    # force a real k-means
            self._corpus._boot_cluster = None
            self._corpus._boot_cluster2 = None
            self._corpus._boot_nbrs = None    # graph rebuilds fresh too
            self._corpus.sync()

    def index_info(self) -> dict:
        info = super().index_info()
        info["kind"] = "ivf"
        # lock-FREE read of the published snapshot (_publish_info):
        # taking the corpus lock here would queue /stats behind a
        # full retrain (~90 s at 10M rows), and an unlocked
        # field-by-field read could tear mid-rebuild (ADVICE r3 #1).
        # The atomically-swapped dict gives whole pre- or post-build
        # state, never a mix.
        info.update(self._corpus._info_pub)
        return info

    def snapshot_base_stale(self) -> bool:
        """True when the on-disk base snapshot predates training (no
        clustering keys) but the corpus is trained now: the checkpoint
        layer should rewrite the base once instead of appending deltas,
        so the next boot skips the k-means retrain."""
        return (self._corpus._centroids_h is not None
                and not getattr(self, "_base_has_clustering", False))

    def write_snapshot(self, path: str, st) -> None:
        """Base snapshot + the trained clustering (extra npz keys —
        older snapshots without them still load, paying the retrain)."""
        self._base_has_clustering = "ivf_centroids" in st
        if "ivf_centroids" not in st:
            super().write_snapshot(path, st)
            return
        os.makedirs(os.path.dirname(os.path.abspath(path)) or ".",
                    exist_ok=True)
        extra = {}
        if "ivf_nbrs" in st:
            extra["ivf_nbrs"] = st["ivf_nbrs"]
        if "ivf_nprobe_tuned" in st:
            extra["ivf_nprobe_tuned"] = st["ivf_nprobe_tuned"]
        if "ivf_tune_curve" in st:
            extra["ivf_tune_curve"] = st["ivf_tune_curve"]
        if "ivf_cand_boost" in st:
            extra["ivf_cand_boost"] = st["ivf_cand_boost"]
        if "ivf_delivered" in st:
            extra["ivf_delivered"] = st["ivf_delivered"]
        np.savez(path, vectors=st["vectors"],
                 ivf_centroids=st["ivf_centroids"],
                 ivf_cluster=st["ivf_cluster"],
                 ivf_cluster2=st.get(
                     "ivf_cluster2",
                     np.full(len(st["ids"]), -1, np.int32)),
                 meta=json.dumps({
                     "dim": self.dim,
                     "ids": list(st["ids"]),
                     "kinds": list(st["kinds"]),
                     "agents": list(st["agents"]),
                 }), **extra)

    def load(self, path: str) -> None:
        super().load(path)
        z = np.load(path, allow_pickle=False)
        self._base_has_clustering = "ivf_centroids" in z.files
        if "ivf_centroids" not in z.files:
            return                            # legacy snapshot: retrain
        meta = json.loads(str(z["meta"]))
        cl = z["ivf_cluster"]
        cl2 = (z["ivf_cluster2"] if "ivf_cluster2" in z.files
               else np.full(len(cl), -1, np.int32))
        co = self._corpus
        with co._lock:
            boot = np.full(co._cap, -1, np.int32)
            boot2 = np.full(co._cap, -1, np.int32)
            row_of = co._row_of
            rows_new = np.full(len(meta["ids"]), -1, np.int64)
            for j, nid in enumerate(meta["ids"]):
                r = row_of.get(nid)
                if r is not None:
                    boot[r] = cl[j]
                    boot2[r] = cl2[j]
                    rows_new[j] = r
            co._boot_cent = z["ivf_centroids"].astype(np.float32)
            co._boot_cluster = boot
            co._boot_cluster2 = boot2
            if "ivf_nprobe_tuned" in z.files:
                co._boot_nprobe_tuned = int(z["ivf_nprobe_tuned"])
                if "ivf_tune_curve" in z.files:
                    co._boot_tune_curve = [
                        (int(p), float(r))
                        for p, r in z["ivf_tune_curve"]]
                if "ivf_cand_boost" in z.files:
                    co._boot_cand_boost = int(z["ivf_cand_boost"])
                if "ivf_delivered" in z.files:
                    co._boot_delivered = float(z["ivf_delivered"])
            if "ivf_nbrs" in z.files and co._graph_degree > 0:
                # remap id-relative neighbor positions to the new row
                # assignment (see state()); absent ids drop their edges
                nbp = z["ivf_nbrs"].astype(np.int32)
                bn = np.full((co._cap, nbp.shape[1]), -1, np.int32)
                ok_src = rows_new >= 0
                tgt = np.where(nbp >= 0, rows_new[
                    np.where(nbp >= 0, nbp, 0)], -1).astype(np.int32)
                bn[rows_new[ok_src]] = tgt[ok_src]
                co._boot_nbrs = bn

    def _fresh_corpus(self) -> IvfCorpus:
        old = self._corpus
        return IvfCorpus(self.dim, nlist=old._nlist_cfg,
                         nprobe=old._nprobe_cfg, spill=old._spill,
                         storage_dtype=self._storage_dtype_str(),
                         search_path=old._search_path,
                         graph_degree=old._graph_degree,
                         target_recall=old._target_recall)
