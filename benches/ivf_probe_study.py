"""Probe-ranking / spill-policy study for the IVF index (r3).

The 1M measurement of plain second-choice spill packing gained only
+0.005 recall@10: the second-nearest centroid is ADJACENT to the
first, so when the home cluster ranks low against a query, the spill
cluster usually does too. This study isolates the candidate-generation
question — for each true top-10 row, was any cluster holding a copy of
it probed? — and compares, on one corpus with one set of true
neighbors:

  probe ranking:   plain <q, c>   vs   <q, c> + alpha * radius_c
                   (clusters with larger member spread probe earlier —
                   their boundaries reach closer to the query)
  spill choice:    none | second-nearest | SOAR (secondary centroid
                   minimizing ||x - c||^2 + lam * <r1_hat, x - c>^2 —
                   residual orthogonality, so the two copies fail on
                   DISJOINT query sets; Sun et al., SOAR)

Probe-hit rate upper-bounds candidate recall (the cand boundary was
measured non-binding: widening cand 64 -> 512 changed recall by 0).

Run: python benches/ivf_probe_study.py [--rows 500000] [--cpu]
Prints one JSON line per (ranking, spill) cell.
"""

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if "--cpu" in sys.argv:
    import jax
    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp

from cortex_tpu.vector.ivf import _kmeans_device

D = 768
K = 10
NQ = 256


def emit(metric, value, unit):
    print(json.dumps({"metric": metric, "value": round(float(value), 4),
                      "unit": unit}), flush=True)


@functools.partial(jax.jit, static_argnames=("n", "groups"))
def _gen(key, n, groups, ck, off):
    idx = (off + jnp.arange(n)) % groups
    keys = jax.vmap(lambda g: jax.random.fold_in(ck, g))(idx)
    ctr = jax.vmap(lambda k: jax.random.normal(k, (D,), jnp.float32))(keys)
    v = ctr + 0.35 * jax.random.normal(key, (n, D), jnp.float32)
    return v / jnp.maximum(jnp.linalg.norm(v, axis=1, keepdims=True),
                           1e-12)


@functools.partial(jax.jit, static_argnames=("t",))
def _assign_top(data, cent, *, t):
    s = jnp.dot(data, cent.T, preferred_element_type=jnp.float32)
    return jax.lax.top_k(s, t)


@functools.partial(jax.jit, static_argnames=("t", "lam"))
def _soar_second(data, cent, idx, v, *, t, lam):
    """Secondary assignment minimizing ||x-c||^2 + lam*<r1_hat, x-c>^2
    over the top-t candidates (excluding the primary)."""
    cj = cent[idx]                          # [S, t, d]
    r1 = data - cj[:, 0]
    r1h = r1 / jnp.maximum(
        jnp.linalg.norm(r1, axis=1, keepdims=True), 1e-12)
    rx = jnp.sum(r1h * data, axis=1)        # <r1_hat, x>
    rc = jnp.einsum("sd,std->st", r1h, cj)  # <r1_hat, c_j>
    loss = (2.0 - 2.0 * v) + lam * (rx[:, None] - rc) ** 2
    loss = loss.at[:, 0].set(jnp.inf)
    j2 = jnp.argmin(loss, axis=1)
    return jnp.take_along_axis(idx, j2[:, None], axis=1)[:, 0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=500_000)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--top-t", type=int, default=8)
    args = ap.parse_args()
    n = args.rows
    c = min(8192, max(2, round(float(np.sqrt(n)))))
    groups = max(1, n // 8)
    ck = jax.random.PRNGKey(11)
    key = jax.random.PRNGKey(7)

    t0 = time.time()
    chunk = 1 << 17
    # corpus stays on device in chunks; host keeps assignments only
    sample = _gen(jax.random.fold_in(key, 0), min(131072, n), groups,
                  ck, 0)
    init = sample[jax.random.choice(jax.random.PRNGKey(1),
                                    sample.shape[0], (c,),
                                    replace=sample.shape[0] < c)]
    cent = _kmeans_device(sample, init, c=c, iters=8)
    del sample, init

    first = np.empty(n, np.int32)
    second_nn = np.empty(n, np.int32)
    second_soar = np.empty(n, np.int32)
    v1 = np.empty(n, np.float32)
    qs = _gen(jax.random.fold_in(key, 999), NQ, groups, ck, 0)
    best_v = np.full((NQ, K), -np.inf, np.float32)
    best_i = np.zeros((NQ, K), np.int64)
    for off in range(0, n, chunk):
        m = min(chunk, n - off)
        data = _gen(jax.random.fold_in(key, 1 + off), m, groups, ck, off)
        v, idx = _assign_top(data, cent, t=args.top_t)
        s2 = _soar_second(data, cent, idx, v, t=args.top_t, lam=1)
        first[off:off + m] = np.asarray(idx[:, 0])
        second_nn[off:off + m] = np.asarray(idx[:, 1])
        second_soar[off:off + m] = np.asarray(s2)
        v1[off:off + m] = np.asarray(v[:, 0])
        # exact oracle over this chunk
        cs = jnp.dot(qs, data.T, preferred_element_type=jnp.float32)
        cv, ci = jax.lax.top_k(cs, K)
        allv = np.concatenate([best_v, np.asarray(cv)], axis=1)
        alli = np.concatenate([best_i, np.asarray(ci) + off], axis=1)
        sel = np.argsort(-allv, axis=1, kind="stable")[:, :K]
        best_v = np.take_along_axis(allv, sel, axis=1)
        best_i = np.take_along_axis(alli, sel, axis=1)
    emit("probe-study build", time.time() - t0,
         f"seconds (rows={n} nlist={c})")

    # cluster radius: mean cosine gap of members (1 - <x, c_first>)
    gap = 1.0 - v1
    radius = np.zeros(c, np.float32)
    cnt = np.bincount(first, minlength=c).astype(np.float32)
    np.add.at(radius, first, gap)
    radius = radius / np.maximum(cnt, 1.0)

    cs_q = np.asarray(jnp.dot(qs, cent.T,
                              preferred_element_type=jnp.float32))
    true_rows = best_i                        # [NQ, K]
    home = first[true_rows]                   # [NQ, K]

    nprobe = max(8, c // 16)
    for alpha in (0.0, 0.25, 0.5, 1.0):
        rank = np.argsort(-(cs_q + alpha * radius[None, :]), axis=1)
        probed = rank[:, :nprobe]             # [NQ, nprobe]
        in_probe = (home[:, :, None] == probed[:, None, :]).any(2)
        for name, sec in (("none", None), ("second-nn", second_nn),
                          ("soar", second_soar)):
            hit = in_probe
            if sec is not None:
                spill = sec[true_rows]
                hit = hit | (spill[:, :, None] == probed[:, None, :]
                             ).any(2)
            emit(f"probe-hit@10 alpha={alpha} spill={name}",
                 float(hit.mean()),
                 f"fraction (nprobe={nprobe}/{c}, full spill)")


if __name__ == "__main__":
    main()
