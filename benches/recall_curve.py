"""Recall/QPS curve across corpus sizes and dtypes (BASELINE configs
#1/#2/#3): batched query streams over the real TpuFlatIndex serving
path, recall measured against the fp32 exact oracle.

Run: python benches/recall_curve.py [--quick]
Prints one JSON line per (N, d, dtype) point.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from cortex_tpu.vector import TpuFlatIndex


def run_point(n, d, dtype, batch=64, rounds=5, k=10):
    rng = np.random.default_rng(0)
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    queries = rng.normal(size=(batch, d)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    idx = TpuFlatIndex(d, storage_dtype=dtype)
    t0 = time.perf_counter()
    idx.insert_batch([f"n{i}" for i in range(n)], vecs)
    idx.search_batch(queries, k)              # sync + compile
    build_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(rounds):
        hits = idx.search_batch(queries, k)
    qps = rounds * batch / (time.perf_counter() - t0)

    # exact oracle on device (fp32)
    ref = np.asarray(jax.lax.top_k(
        jnp.dot(jnp.asarray(queries), jnp.asarray(vecs).T,
                preferred_element_type=jnp.float32), k)[1])
    got = [[int(i[1:]) for i, _ in row if i is not None] for row in hits]
    recall = float(np.mean([
        len(set(ref[b]) & set(got[b])) / k for b in range(batch)]))

    print(json.dumps({
        "metric": f"serving-path top-{k} @ {n}x{d} ({dtype}, batch "
                  f"{batch})",
        "value": round(qps, 1), "unit": "queries/sec",
        "recall_at_10": round(recall, 4),
        "build_secs": round(build_s, 2),
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    points = [(10_000, 384, "float32"),       # config #1 scale
              (100_000, 384, "float32"),      # config #2 scale
              (100_000, 384, "bfloat16")]
    if not args.quick and jax.devices()[0].platform == "tpu":
        # config #3 scale; NOTE: behind a tunneled TPU the 1.5GB corpus
        # upload alone takes minutes — kernel-level numbers for this
        # point come from bench.py, which generates the corpus on-device
        points += [(1_000_000, 768, "bfloat16")]
    for n, d, dt in points:
        run_point(n, d, dt)


if __name__ == "__main__":
    main()
