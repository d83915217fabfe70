"""Stage-by-stage profile of the fused serving dispatch at 1M x 768.

Decomposes cosine_topk_quant_exact's ~5.6 ms/batch-512 into:
  matmul-floor   int8 scan + scalar max consumer (XLA fuses the max
                 into the matmul consumer chain -> no [B, N] score
                 materialization; this is the corpus-read + MXU floor)
  +descale       adds the fp32 descale epilogue (same consumer)
  +approx_max_k  the shipped candidate selection (PartialReduce) —
                 the delta vs the floor is the score-materialization /
                 reduction cost, IF there is one
  full           the shipped fused program (scan + gather + exact
                 re-rank + final top-k)

Also measures a bf16-score variant (descale to bf16 before the
reduction) to see whether halving score traffic moves anything —
worthwhile only if approx_max_k's delta is large.

Run: python benches/fused_profile.py [--batch 512]
"""

import argparse
import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.append(".")

N, D = 1_000_000, 768
ROUNDS = 30


def _drain(out):
    """Fetch a scalar from the result — behind a remote-dispatch
    transport (tunneled TPUs) `block_until_ready` is a no-op, so the
    only real drain is a fetch; device execution is in-order, so
    fetching the LAST round's result drains the whole pipeline."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf[0, ...] if leaf.ndim > 1 else leaf[0])


def timed(fn, *args):
    out = fn(*args)            # compile
    _drain(out)
    t0 = time.perf_counter()
    for _ in range(ROUNDS - 1):
        fn(*args)
    _drain(fn(*args))
    return (time.perf_counter() - t0) / ROUNDS * 1e3


@jax.jit
def scan_floor(ci8, q):
    qmax = jnp.max(jnp.abs(q), axis=1)
    qs = 127.0 / jnp.maximum(qmax, 1e-12)
    qi8 = jnp.clip(jnp.round(q * qs[:, None]), -127, 127).astype(jnp.int8)
    s32 = jax.lax.dot_general(qi8, ci8, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return jnp.max(s32, axis=1)


@jax.jit
def scan_descale(ci8, rinv, q):
    qmax = jnp.max(jnp.abs(q), axis=1)
    qs = 127.0 / jnp.maximum(qmax, 1e-12)
    qi8 = jnp.clip(jnp.round(q * qs[:, None]), -127, 127).astype(jnp.int8)
    s32 = jax.lax.dot_general(qi8, ci8, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.int32)
    s = s32.astype(jnp.float32) * (rinv[None, :] / qs[:, None])
    return jnp.max(s, axis=1)


@functools.partial(jax.jit, static_argnames=("cand", "over", "bf16"))
def scan_select(ci8, rinv, q, cand=64, over=512, bf16=False):
    qmax = jnp.max(jnp.abs(q), axis=1)
    qs = 127.0 / jnp.maximum(qmax, 1e-12)
    qi8 = jnp.clip(jnp.round(q * qs[:, None]), -127, 127).astype(jnp.int8)
    s32 = jax.lax.dot_general(qi8, ci8, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.int32)
    s = s32.astype(jnp.float32) * (rinv[None, :] / qs[:, None])
    if bf16:
        s = s.astype(jnp.bfloat16)
    v, i = jax.lax.approx_max_k(s, over, recall_target=0.95,
                                aggregate_to_topk=False)
    v2, sel = jax.lax.top_k(v.astype(jnp.float32), cand)
    return v2, jnp.take_along_axis(i, sel, axis=1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    args = ap.parse_args()
    B = args.batch

    from cortex_tpu.ops.similarity import (cosine_topk_quant_exact,
                                           normalize_rows)

    key = jax.random.PRNGKey(0)
    kc, kq = jax.random.split(key)
    corpus = normalize_rows(jax.random.normal(kc, (N, D), jnp.float32))
    centered = corpus - jnp.mean(corpus, axis=0)[None, :]
    rmax = jnp.max(jnp.abs(centered), axis=1)
    rscale = 127.0 / jnp.maximum(rmax, 1e-12)
    ci8 = jnp.clip(jnp.round(centered * rscale[:, None]),
                   -127, 127).astype(jnp.int8)
    rinv = (1.0 / rscale).astype(jnp.float32)
    del centered
    jax.block_until_ready(ci8)
    q = normalize_rows(jax.random.normal(kq, (B, D), jnp.float32))
    bias1d = jnp.zeros((N,), jnp.float32)

    rows = [
        ("matmul-floor (int8 scan + fused max)",
         timed(scan_floor, ci8, q)),
        ("+fp32 descale", timed(scan_descale, ci8, rinv, q)),
        ("+approx_max_k select (shipped stage)",
         timed(scan_select, ci8, rinv, q)),
        ("+approx_max_k over bf16 scores",
         timed(functools.partial(scan_select, bf16=True), ci8, rinv, q)),
        ("full fused serving dispatch",
         timed(lambda: cosine_topk_quant_exact(ci8, rinv, corpus, q,
                                               10, 64, bias1d,
                                               over=512))),
    ]
    for name, ms in rows:
        print(f"{name:45s} {ms:8.3f} ms/batch-{B} "
              f"({B / ms * 1e3:,.0f} qps)")


if __name__ == "__main__":
    main()
