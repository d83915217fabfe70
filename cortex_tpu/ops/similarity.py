"""Fused cosine-similarity + top-k — the innermost loop of the engine.

This replaces the reference's HNSW pointer-chasing search
(crates/cortex-core/src/vector/index.rs:342-373, cosine distance at
:169-179) with batched MXU computation over a device-resident padded
corpus `[N, d]`:

    scores = Q @ E^T          (rows pre-normalized → dot == cosine)
    scores += mask_bias       (liveness / kind / agent / exclusion)
    top-k over N              (per query row)

Two implementations with identical semantics:

  * `cosine_topk_xla` — plain jnp matmul + jax.lax.top_k. XLA fuses the
    bias add into the matmul epilogue; TopK is its native HLO. Works on
    any backend; this is also the correctness oracle for the kernel.
  * `cosine_topk_pallas` — a Pallas TPU kernel that streams the corpus
    through VMEM in (block_n × d) tiles and maintains a running top-k per
    query *inside* the kernel (flash-attention-style online accumulation
    over the candidate axis), so the full [B, N] score row never
    materializes in HBM. Memory traffic = N·d reads (bandwidth-bound
    speed of light for a flat exact scan).

Both accept a per-row additive bias (0 or -inf) used for masking dead
rows and metadata filters; masking in-kernel replaces the reference's
k×10 over-fetch + host filter trick (vector/index.rs:350).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30  # python float: safe to close over inside pallas kernels


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def normalize_rows(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """L2-normalize rows so dot products are cosine similarities."""
    n = jnp.linalg.norm(x, axis=-1, keepdims=True)
    return x / jnp.maximum(n, eps)


# ---------------------------------------------------------------------------
# XLA path
# ---------------------------------------------------------------------------


def cosine_scores(corpus: jnp.ndarray, queries: jnp.ndarray,
                  bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """[B, N] similarity matrix. corpus [N, d], queries [B, d] (normalized)."""
    s = jnp.dot(queries, corpus.T, preferred_element_type=jnp.float32)
    if bias is not None:
        s = s + bias
    return s


@functools.partial(jax.jit, static_argnames=("k",))
def cosine_topk_xla(corpus: jnp.ndarray, queries: jnp.ndarray, k: int,
                    bias: Optional[jnp.ndarray] = None
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k: returns (scores [B,k], row_indices [B,k])."""
    s = cosine_scores(corpus, queries, bias)
    return jax.lax.top_k(s, k)


@functools.partial(jax.jit, static_argnames=("k", "over", "recall_target"))
def cosine_topk_approx(corpus: jnp.ndarray, queries: jnp.ndarray, k: int,
                       bias: Optional[jnp.ndarray] = None,
                       *, over: int = 256, recall_target: float = 0.95
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """TPU-native near-exact top-k: matmul + `lax.approx_max_k` (the
    hardware-accelerated PartialReduce TopK) over-fetching `over`
    candidates, then an exact top-k merge of the candidate set.

    With over >= 25*k the measured recall@k is ~1.0 at 1M x 768 while
    running ~2x faster than sort-based `lax.top_k` (the approx pass is
    a streaming reduction, not a sort). The corpus may be bf16; scores
    accumulate fp32. This is the serving-path winner on v5e — see
    bench.py."""
    s = cosine_scores(corpus, queries.astype(corpus.dtype), bias)
    n = s.shape[1]
    ov = min(max(over, k), n)
    # aggregate_to_topk=False skips approx_max_k's own final top-k pass
    # (we re-merge exactly below anyway) — the raw per-block maxima are
    # a SUPERSET of the aggregated candidates, so recall only improves;
    # measured +8% QPS at 1Mx768
    v, i = jax.lax.approx_max_k(s, ov, recall_target=recall_target,
                                aggregate_to_topk=False)
    v2, sel = jax.lax.top_k(v, min(k, v.shape[1]))
    out_v = v2[:, :min(k, ov)]
    out_i = jnp.take_along_axis(i, sel, axis=1)[:, :min(k, ov)]
    return out_v, out_i


# ---------------------------------------------------------------------------
# Pallas kernel: blocked scan with online top-k
# ---------------------------------------------------------------------------
#
# Grid: (num_n_blocks,). Each step loads one corpus tile [BLOCK_N, d] into
# VMEM, computes the [B, BLOCK_N] score tile on the MXU, and folds it into a
# running top-k held in VMEM scratch ([B, K_pad] values + global indices).
# The fold is iterative selection: K rounds of (row max → record → mask),
# entirely VPU ops on a [B, BLOCK_N + K_pad] workspace. At the final grid
# step the running lists are written out.
#
# K_pad is rounded up to a 128 lane multiple; B to the fp32 sublane (8).


def _fold_topk(scores: jnp.ndarray, gidx: jnp.ndarray,
               best_v: jnp.ndarray, best_i: jnp.ndarray, k: int,
               k_pad: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Merge a [B, L] score tile into running [B, K_pad] bests (only the
    first `k` lanes are live; the rest stay NEG_INF). Pure fn — k rounds
    of (row max -> record -> mask) selection on the VPU."""
    b = scores.shape[0]
    work_v = jnp.concatenate([scores, best_v], axis=1)          # [B, L+K]
    work_i = jnp.concatenate([gidx, best_i], axis=1)
    width = work_v.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (b, width), 1)
    out_lane = jax.lax.broadcasted_iota(jnp.int32, (b, k_pad), 1)

    def body(j, carry):
        wv, nv, ni = carry
        m = jnp.max(wv, axis=1, keepdims=True)                  # [B, 1]
        is_m = wv == m
        # first matching lane per row (ties broken to lowest lane)
        sel = jnp.min(jnp.where(is_m, lane, width), axis=1, keepdims=True)
        hit = lane == sel                                        # [B, width] one-hot
        idx_at = jnp.sum(jnp.where(hit, work_i, 0), axis=1)      # [B]
        val_at = jnp.sum(jnp.where(hit, wv, 0.0), axis=1)
        # one-hot column write (Mosaic has no dynamic scatter)
        col = out_lane == j
        nv = jnp.where(col, val_at[:, None], nv)
        ni = jnp.where(col, idx_at[:, None], ni)
        wv = jnp.where(hit, NEG_INF, wv)
        return wv, nv, ni

    nv0 = jnp.full((b, k_pad), NEG_INF, jnp.float32)
    ni0 = jnp.zeros((b, k_pad), jnp.int32)
    _, nv, ni = jax.lax.fori_loop(0, k, body, (work_v, nv0, ni0))
    return nv, ni


def _topk_kernel(q_ref, c_ref, bias_ref, out_v_ref, out_i_ref,
                 best_v, best_i, *, k: int, k_pad: int, block_n: int):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        best_v[:] = jnp.full_like(best_v, NEG_INF)
        best_i[:] = jnp.zeros_like(best_i)

    q = q_ref[:]                                   # [B, d]
    c = c_ref[:]                                   # [BLOCK_N, d]
    scores = jax.lax.dot_general(
        q, c, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)        # [B, BLOCK_N]
    scores = scores + bias_ref[:]                  # [1, BLOCK_N] broadcast

    # flash-style skip: the fold (k selection rounds on the VPU) only
    # runs when some row's block max beats that row's current kth-best.
    # After warmup almost every block loses, so the steady cost is just
    # the matmul — the bandwidth roofline.
    lane = jax.lax.broadcasted_iota(jnp.int32, (best_v.shape[0], k_pad), 1)
    kth_best = jnp.min(jnp.where(lane < k, best_v[:], jnp.inf),
                       axis=1, keepdims=True)       # [B, 1]
    block_max = jnp.max(scores, axis=1, keepdims=True)
    improves = jnp.any(block_max > kth_best)

    @pl.when(improves)
    def _fold():
        base = step * block_n
        gidx = base + jax.lax.broadcasted_iota(
            jnp.int32, scores.shape, 1)
        nv, ni = _fold_topk(scores, gidx, best_v[:], best_i[:], k, k_pad)
        best_v[:] = nv
        best_i[:] = ni

    @pl.when(step == pl.num_programs(0) - 1)
    def _emit():
        out_v_ref[:] = best_v[:]
        out_i_ref[:] = best_i[:]


@functools.partial(jax.jit,
                   static_argnames=("k", "block_n", "interpret"))
def cosine_topk_pallas(corpus: jnp.ndarray, queries: jnp.ndarray, k: int,
                       bias: Optional[jnp.ndarray] = None,
                       *, block_n: int = 2048,
                       interpret: bool = False
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Blocked flat-scan exact top-k. corpus [N, d] (N % block_n == 0 after
    internal padding), queries [B, d], bias per-corpus-row [N] or [1, N]
    (liveness/filter masks are row properties, so the kernel streams one
    [1, block_n] bias tile per step instead of a [B, N] matrix). The
    corpus may be stored bf16 (halves the dominant HBM traffic);
    accumulation is always fp32 on the MXU. Returns ([B, k], [B, k])."""
    n, d = corpus.shape
    b = queries.shape[0]
    k_pad = _round_up(max(k, 1), 128)
    b_pad = _round_up(max(b, 1), 8)
    n_pad = _round_up(n, block_n)
    d_pad = _round_up(d, 128)

    if d_pad != d or n_pad != n:
        corpus = jnp.pad(corpus, ((0, n_pad - n), (0, d_pad - d)))
    if d_pad != d or b_pad != b:
        queries = jnp.pad(queries, ((0, b_pad - b), (0, d_pad - d)))
    queries = queries.astype(corpus.dtype)  # bf16 corpus -> bf16 MXU input
    row_bias = jnp.zeros((1, n_pad), jnp.float32)
    if bias is not None:
        row_bias = row_bias.at[:, :n].set(
            jnp.reshape(bias, (1, n)).astype(jnp.float32))
    if n_pad != n:
        row_bias = row_bias.at[:, n:].set(NEG_INF)  # padding rows dead

    grid = (n_pad // block_n,)
    out_v, out_i = pl.pallas_call(
        functools.partial(_topk_kernel, k=min(k, n), k_pad=k_pad,
                          block_n=block_n),
        grid=grid,
        in_specs=[
            pl.BlockSpec((b_pad, d_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, d_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((b_pad, k_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_pad, k_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, k_pad), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b_pad, k_pad), jnp.float32),
            pltpu.VMEM((b_pad, k_pad), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * n_pad * d_pad,
            bytes_accessed=(n_pad * d_pad * corpus.dtype.itemsize
                            + b_pad * d_pad * queries.dtype.itemsize
                            + n_pad * 4),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),   # sequential scan axis
            vmem_limit_bytes=100 * 1024 * 1024,
        ) if not interpret else None,
        interpret=interpret,
    )(queries, corpus, row_bias)
    return out_v[:b, :k], out_i[:b, :k]


# ---------------------------------------------------------------------------
# dispatcher
# ---------------------------------------------------------------------------


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # noqa: BLE001
        return False


def cosine_topk(corpus: jnp.ndarray, queries: jnp.ndarray, k: int,
                bias: Optional[jnp.ndarray] = None,
                *, prefer_pallas: Optional[bool] = None
                ) -> Tuple[np.ndarray, np.ndarray]:
    """Dispatch to the Pallas kernel on TPU (large corpora) else XLA."""
    n = corpus.shape[0]
    if prefer_pallas is None:
        prefer_pallas = _on_tpu() and n >= 4096
    if prefer_pallas:
        v, i = cosine_topk_pallas(corpus, queries, k, bias)
    else:
        v, i = cosine_topk_xla(corpus, queries, min(k, n), bias)
        if k > n:  # pad to requested k with dead entries
            pad = k - n
            v = jnp.pad(v, ((0, 0), (0, pad)), constant_values=NEG_INF)
            i = jnp.pad(i, ((0, 0), (0, pad)))
    return np.asarray(v), np.asarray(i)
