"""Candidate-selection fusion experiments at 1M x 768, batch 512.

fused_profile.py showed the shipped approx_max_k stage adds ~2.4 ms to
a ~3.0 ms int8 matmul floor: approx_max_k is a custom call, so the
[B, N] f32 score buffer materializes (dot epilogue write) and is then
re-read by the PartialReduce. A plain jnp.max consumer FUSES into the
dot (floor run) — no score traffic at all.

These experiments test whether a per-bin max/argmax fold can replace
approx_max_k as the candidate stage while staying inside the dot
fusion:

  E1  dot -> reshape [B, nb, bs] -> max(axis=2)            (values)
  E2  E1 + argmax(axis=2)                                  (val + idx)
  E3  full candidate pipeline: per-bin max+argmax -> top-cand bins
      -> row ids -> device exact fp32 re-rank -> final top-k
      (recall measured vs the fp32-exact oracle)
  E4  dot -> opt barrier -> max  (forced materialization control:
      isolates "materialize + read" cost from PartialReduce compute)

Run: python benches/select_experiments.py [--batch 512]
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
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf[0, ...] if leaf.ndim > 1 else leaf[0])


def timed(fn, *args):
    out = fn(*args)
    _drain(out)
    t0 = time.perf_counter()
    for _ in range(ROUNDS - 1):
        fn(*args)
    _drain(fn(*args))
    return (time.perf_counter() - t0) / ROUNDS * 1e3


def _scores(ci8, rinv, q):
    qmax = jnp.max(jnp.abs(q), axis=1)
    qs = 127.0 / jnp.maximum(qmax, 1e-12)
    qi8 = jnp.clip(jnp.round(q * qs[:, None]), -127, 127).astype(jnp.int8)
    s32 = jax.lax.dot_general(qi8, ci8, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return s32.astype(jnp.float32) * (rinv[None, :] / qs[:, None])


@functools.partial(jax.jit, static_argnames=("bs",))
def e1_binmax(ci8, rinv, q, bs=16):
    s = _scores(ci8, rinv, q)
    b = s.shape[0]
    return jnp.max(s.reshape(b, -1, bs), axis=2)


@functools.partial(jax.jit, static_argnames=("bs",))
def e2_binmax_argmax(ci8, rinv, q, bs=16):
    s = _scores(ci8, rinv, q).reshape(q.shape[0], -1, bs)
    return jnp.max(s, axis=2), jnp.argmax(s, axis=2).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("k", "cand", "bs"))
def e3_full(ci8, rinv, cf32, q, k=10, cand=64, bs=16):
    s = _scores(ci8, rinv, q).reshape(q.shape[0], -1, bs)
    bv = jnp.max(s, axis=2)
    ba = jnp.argmax(s, axis=2).astype(jnp.int32)
    v, bins = jax.lax.top_k(bv, cand)           # [B, cand] bin ids
    rows = bins * bs + jnp.take_along_axis(ba, bins, axis=1)
    g = cf32[rows]                              # [B, cand, d]
    exact = jnp.einsum("bcd,bd->bc", g, q,
                       precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)
    fv, sel = jax.lax.top_k(exact, k)
    return fv, jnp.take_along_axis(rows, sel, axis=1)


@functools.partial(jax.jit, static_argnames=("k", "cand", "bs", "over"))
def e3b_full_approx2(ci8, rinv, cf32, q, k=10, cand=64, bs=16, over=512):
    """Like E3 but stage 2 uses approx_max_k over the (small) bin-max
    buffer instead of full top_k, with the usual exact merge."""
    s = _scores(ci8, rinv, q).reshape(q.shape[0], -1, bs)
    bv = jnp.max(s, axis=2)
    ba = jnp.argmax(s, axis=2).astype(jnp.int32)
    ov = min(max(over, cand), bv.shape[1])
    av, ai = jax.lax.approx_max_k(bv, ov, recall_target=0.95,
                                  aggregate_to_topk=False)
    v2, sel = jax.lax.top_k(av, cand)
    bins = jnp.take_along_axis(ai, sel, axis=1)
    rows = bins * bs + jnp.take_along_axis(ba, bins, axis=1)
    g = cf32[rows]
    exact = jnp.einsum("bcd,bd->bc", g, q,
                       precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)
    fv, sel2 = jax.lax.top_k(exact, k)
    return fv, jnp.take_along_axis(rows, sel2, axis=1)


@jax.jit
def e4_barrier_max(ci8, rinv, q):
    s = _scores(ci8, rinv, q)
    s = jax.lax.optimization_barrier(s)
    return jnp.max(s, axis=1)


@functools.partial(jax.jit, static_argnames=("k",))
def oracle(cf32, q, k):
    s = jnp.dot(q, cf32.T, precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
    return jax.lax.top_k(s, k)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    args = ap.parse_args()
    B = args.batch

    from cortex_tpu.ops.similarity import normalize_rows

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

    print(f"batch {B}:")
    print(f"  E4 barrier+max (materialize control)   "
          f"{timed(e4_barrier_max, ci8, rinv, q):8.3f} ms")
    for bs in (8, 16, 64, 256):
        print(f"  E1 bin-max bs={bs:<4d}                      "
              f"{timed(functools.partial(e1_binmax, bs=bs), ci8, rinv, q):8.3f} ms")
    for bs in (8, 16, 64):
        print(f"  E2 bin-max+argmax bs={bs:<4d}               "
              f"{timed(functools.partial(e2_binmax_argmax, bs=bs), ci8, rinv, q):8.3f} ms")

    # recall for E3 against the fp32-exact oracle
    ov, oi = oracle(corpus, q, 10)
    oi_np = np.asarray(oi)
    for bs in (8, 16, 64):
        fn = functools.partial(e3_full, bs=bs)
        ms = timed(fn, ci8, rinv, corpus, q)
        _, ri = fn(ci8, rinv, corpus, q)
        ri_np = np.asarray(ri)
        rec = np.mean([np.isin(oi_np[b], ri_np[b]).mean()
                       for b in range(B)])
        print(f"  E3 full pipeline bs={bs:<4d}                "
              f"{ms:8.3f} ms ({B/ms*1e3:,.0f} qps) recall@10={rec:.4f}")
    for bs in (8, 16):
        fn = functools.partial(e3b_full_approx2, bs=bs)
        ms = timed(fn, ci8, rinv, corpus, q)
        _, ri = fn(ci8, rinv, corpus, q)
        ri_np = np.asarray(ri)
        rec = np.mean([np.isin(oi_np[b], ri_np[b]).mean()
                       for b in range(B)])
        print(f"  E3b approx stage2 bs={bs:<4d}               "
              f"{ms:8.3f} ms ({B/ms*1e3:,.0f} qps) recall@10={rec:.4f}")


if __name__ == "__main__":
    main()
