"""Fused cosine-similarity + top-k — the innermost loop of the engine.

This replaces the reference's HNSW pointer-chasing search
(crates/cortex-core/src/vector/index.rs:342-373, cosine distance at
:169-179) with batched MXU computation over a device-resident padded
corpus `[N, d]`:

    scores = Q @ E^T          (rows pre-normalized → dot == cosine)
    scores += mask_bias       (liveness / kind / agent / exclusion)
    top-k over N              (per query row)

Three serving paths, fastest first (all measured at 1M x 768, batch 64,
k=10, on one v5e — see BASELINE.md):

  * `cosine_topk_quant` — int8 corpus scan (per-row scales, fp32
    descale fused into the matmul epilogue) + `lax.approx_max_k`
    candidate selection + exact top-`cand` merge. Halves the dominant
    HBM read vs bf16. Candidate ORDER at the boundary carries int8
    noise, so callers re-rank the returned candidates exactly against
    the fp32 host mirror (DeviceCorpus does this; the numpy gather of
    ~2k rows is ~0.5 ms and pipelines behind the next device batch).
    ~39k QPS; candidate-set recall ~1.0 at cand >= 2k+16.
  * `cosine_topk_approx` — bf16 corpus matmul + `approx_max_k`
    (hardware PartialReduce) over-fetch + exact merge. ~25k QPS at
    recall@10 = 1.000. The all-device near-exact path.
  * `cosine_topk_xla` — plain matmul + `jax.lax.top_k`. Exact by
    construction; the correctness oracle and the CPU/small-corpus path.

Why there is no Pallas kernel here (r1 shipped one; r2 deleted it):
the r1 flash-style Pallas scan measured 6.9k QPS vs XLA's 8.7k, and a
rewritten binned kernel (matmul + strided top-2-per-bin fold, no
[B, N] materialization, no cross-step carry) still measured 8.5k.
Isolation runs showed Mosaic's in-kernel matmul sustains only ~20-30
TFLOP/s on this target at these shapes regardless of operand order,
block size, or residency, while XLA's matmul pipeline runs the same
scan at ~800 GB/s (bandwidth-bound). The memory-traffic win the kernel
was meant to deliver (dropping the [B, N] score materialization) is
instead taken by quantizing the scan itself (int8 halves the corpus
read — a strictly larger win than removing the score write). A kernel
that loses to XLA at every k it serves is dead weight (VERDICT r1 #4).

Bias masking (0 or -1e30 per corpus row) replaces the reference's
k×10 over-fetch + host filter trick (vector/index.rs:350) in all paths.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e30  # python float; bf16-representable

def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def normalize_rows(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """L2-normalize rows so dot products are cosine similarities."""
    n = jnp.linalg.norm(x, axis=-1, keepdims=True)
    return x / jnp.maximum(n, eps)


# ---------------------------------------------------------------------------
# XLA exact path
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
    s = cosine_scores(corpus, queries.astype(corpus.dtype), bias)
    return jax.lax.top_k(s, k)


# ---------------------------------------------------------------------------
# approx path: bf16/fp32 matmul + hardware PartialReduce + exact merge
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("k", "over", "recall_target"))
def cosine_topk_approx(corpus: jnp.ndarray, queries: jnp.ndarray, k: int,
                       bias: Optional[jnp.ndarray] = None,
                       *, over: int = 256, recall_target: float = 0.95
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Near-exact top-k: matmul + `lax.approx_max_k` (the
    hardware-accelerated PartialReduce TopK) over-fetching `over`
    candidates, then an exact top-k merge of the candidate set.

    With over >= 25*k the measured recall@k is ~1.0 at 1M x 768 while
    running ~2x faster than sort-based `lax.top_k` (the approx pass is
    a streaming reduction, not a sort). The corpus may be bf16; scores
    accumulate fp32."""
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
# quantized path: int8 scan + candidate list for an exact host re-rank
# ---------------------------------------------------------------------------


def quantize_rows(x: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Per-row symmetric int8 quantization of [N, d] (host side).
    Returns (int8 values [N, d], per-row dequant factors rinv [N]).
    row = values * rinv[row] up to rounding."""
    x = np.asarray(x, np.float32)
    rmax = np.max(np.abs(x), axis=-1)
    scale = 127.0 / np.maximum(rmax, 1e-12)
    q = np.clip(np.rint(x * scale[..., None]), -127, 127).astype(np.int8)
    return q, (1.0 / scale).astype(np.float32)


def quantize_rows_centered(x: np.ndarray, mu: Optional[np.ndarray] = None
                           ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Ranking-invariant centered int8 quantization.

    Scores q·(x−μ) order IDENTICALLY to q·x for every query (the q·μ
    term is a per-query constant), so the candidate scan may run on
    centered rows — and the int8 range then covers only the part of
    each row that discriminates between corpus items. Real text
    encoders are strongly anisotropic (every embedding shares a large
    common component; cosine gaps live in the residual): uncentered
    quantization spends most of the int8 range on that shared
    component, and recall@10 collapses to ~0.79 on a random-feature
    BERT text corpus. Centered, the same corpus measures 1.0
    (benches/semantic_recall_study.py).

    Any FIXED shift is ranking-correct — μ need not be the exact
    current mean — so incremental index updates may quantize new rows
    against a stale μ (pass it in); only a full resync recomputes it.
    Candidate scores returned by the scan are shifted by −q·μ and must
    not be used as absolute cosines; the serving path's exact fp32
    re-rank already replaces them."""
    x = np.asarray(x, np.float32)
    if mu is None:
        mu = x.mean(axis=0).astype(np.float32)
    q, rinv = quantize_rows(x - mu[None, :])
    return q, rinv, mu


def _quant_candidates(corpus_i8: jnp.ndarray, rinv: jnp.ndarray,
                      queries: jnp.ndarray, cand: int,
                      bias: Optional[jnp.ndarray], over: int
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Traced body shared by the quant paths: int8 scan ->
    ([B, cand] approx scores, [B, cand] int32 rows)."""
    qmax = jnp.max(jnp.abs(queries), axis=1)
    qs = 127.0 / jnp.maximum(qmax, 1e-12)
    qi8 = jnp.clip(jnp.round(queries * qs[:, None]), -127, 127
                   ).astype(jnp.int8)
    s32 = jax.lax.dot_general(qi8, corpus_i8, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.int32)
    s = s32.astype(jnp.float32) * (rinv[None, :] / qs[:, None])
    if bias is not None:
        s = s + jnp.reshape(bias, (1, -1))
    n = s.shape[1]
    ov = min(max(over, cand), n)
    v, i = jax.lax.approx_max_k(s, ov, recall_target=0.95,
                                aggregate_to_topk=False)
    kk = min(cand, v.shape[1])
    v2, sel = jax.lax.top_k(v, kk)
    out_i = jnp.take_along_axis(i, sel, axis=1)
    if kk < cand:
        v2 = jnp.pad(v2, ((0, 0), (0, cand - kk)), constant_values=NEG_INF)
        out_i = jnp.pad(out_i, ((0, 0), (0, cand - kk)))
    return v2, out_i


@functools.partial(jax.jit, static_argnames=("cand", "over"))
def cosine_topk_quant(corpus_i8: jnp.ndarray, rinv: jnp.ndarray,
                      queries: jnp.ndarray, cand: int,
                      bias: Optional[jnp.ndarray] = None,
                      *, over: int = 256
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """int8 candidate scan. corpus_i8 [N, d] int8 with per-row dequant
    factors rinv [N]; queries [B, d] fp32 (normalized). Returns the
    top-`cand` candidates per query by descaled (approximate) score:
    ([B, cand] fp32 scores, [B, cand] int32 rows).

    The returned ORDER near the boundary carries quantization noise
    (sigma ~3e-4 per score at d=768) — callers MUST re-rank the
    candidates exactly (cheap: `cand` rows per query from the fp32
    host mirror) and should over-provision cand >= 2k+16 so true
    top-k membership survives the noise."""
    return _quant_candidates(corpus_i8, rinv, queries, cand, bias, over)


@functools.partial(jax.jit, static_argnames=("k", "cand", "over"))
def cosine_topk_quant_exact(corpus_i8: jnp.ndarray, rinv: jnp.ndarray,
                            corpus_f32: jnp.ndarray, queries: jnp.ndarray,
                            k: int, cand: int,
                            bias: Optional[jnp.ndarray] = None,
                            *, over: int = 256
                            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """int8 candidate scan + DEVICE exact fp32 re-rank, one program.

    The r2 serving path re-ranked candidates on the HOST (numpy gather
    + BLAS) because an early measurement suggested XLA's device row
    gather lowered to a serial slice loop. Re-measured r3 at serving
    shapes ([512, 40] candidate gather from 1M x 768 under jit, fused
    into the scoring einsum): 0.057 ms/batch — bandwidth-class, 3000x
    the host leg (172 ms on the 1-vCPU bench host). So the exact
    re-rank moves on-device: gather the candidate rows from the
    resident fp32 corpus, score with a Precision.HIGHEST einsum (the
    oracle's own precision class — r2 verified it identical to a
    numpy fp32 scan), and return the final top-k. One device dispatch,
    no host leg, nothing to pipeline.

    Candidate MEMBERSHIP comes from the int8 scan exactly as before
    (cand >= 2k+16 over-provisioning); this changes only where the
    exact ORDER is computed. Requires the fp32 corpus device-resident
    (storage_dtype float32 — the default)."""
    cv, ci = _quant_candidates(corpus_i8, rinv, queries, cand, bias, over)
    valid = cv > NEG_INF / 2
    rows = jnp.where(valid, ci, 0)
    g = corpus_f32[rows]                                   # [B, cand, d]
    exact = jnp.einsum("bcd,bd->bc", g, queries,
                       precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)
    exact = jnp.where(valid, exact, NEG_INF)
    kk = min(k, cand)
    v, sel = jax.lax.top_k(exact, kk)
    i = jnp.take_along_axis(ci, sel, axis=1)
    if kk < k:
        v = jnp.pad(v, ((0, 0), (0, k - kk)), constant_values=NEG_INF)
        i = jnp.pad(i, ((0, 0), (0, k - kk)))
    return v, i


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
                *, prefer_approx: Optional[bool] = None
                ) -> Tuple[np.ndarray, np.ndarray]:
    """Dispatch: approx+exact-merge on TPU for large corpora, else the
    exact XLA scan."""
    n = corpus.shape[0]
    if prefer_approx is None:
        prefer_approx = _on_tpu() and n >= 4096
    if prefer_approx and k <= n:
        v, i = cosine_topk_approx(corpus, queries, k, bias,
                                  over=max(256, 4 * k))
    else:
        v, i = cosine_topk_xla(corpus, queries, min(k, n), bias)
        if k > n:  # pad to requested k with dead entries
            pad = k - n
            v = jnp.pad(v, ((0, 0), (0, pad)), constant_values=NEG_INF)
            i = jnp.pad(i, ((0, 0), (0, pad)))
    return np.asarray(v), np.asarray(i)
