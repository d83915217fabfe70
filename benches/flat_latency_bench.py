"""Flat-path latency table (VERDICT r3 #9).

The IVF bet was benchmarked per batch size at 1M and 10M
(ivf_scale_bench); the flat path's small-batch story existed only as
a derived claim ("~1.7 ms corpus pass at 1M"). This bench gives the
flat serving kernel its own batch 1/8/64 rows so the auto policy's
crossover (flat by default, IVF opt-in at 10M+ small-batch) is
quotable from measurements on both sides:

  * per-dispatch latency p50/p95/p99, SEQUENTIAL dispatch+drain —
    through a tunneled TPU this bounds transport RTT + device time;
    the device-time row below isolates the engine
  * device-time per batch from pipelined dispatch (ROUNDS in-order
    executions, one drain — transport amortized out), and the QPS
    that implies

Corpus is generated and quantized ON DEVICE (as bench.py does — a
3/7.7 GB host upload would bench the link, not the engine).

  * 1M: the serving path is int8 scan + fused on-device fp32 re-rank
    (cosine_topk_quant_exact — fp32 corpus resident, engine default)
  * 10M (--rows 10000000): a 30 GB fp32 corpus cannot reside, so the
    engine serves quant-only residency: int8 candidate scan on device
    (cosine_topk_quant) + exact host-mirror re-rank. The device scan
    is measured here; the host leg was measured separately at
    1.9 ms/batch-64 (benches/rerank_host_leg.py, BASELINE.md 10M row)

Run: python benches/flat_latency_bench.py [--rows 1000000] [--cpu]
Prints one JSON line per cell.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if "--cpu" in sys.argv:      # must precede backend init
    import jax
    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp

D, K = 768, 10
CAND, OVER = 64, 512         # engine serving defaults (shard._cand_count)
REPS = int(os.environ.get("LAT_REPS", 50))
ROUNDS = int(os.environ.get("LAT_ROUNDS", 60))
CHUNK = 500_000


def emit(metric, value, unit, **extra):
    row = {"metric": metric, "value": round(float(value), 3),
           "unit": unit}
    row.update(extra)
    print(json.dumps(row), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    from cortex_tpu.ops.similarity import (cosine_topk_quant,
                                           cosine_topk_quant_exact,
                                           normalize_rows)
    from cortex_tpu.utils.device import preflight_device
    from cortex_tpu.vector.shard import _fetch_array, wait_ready
    preflight_device()

    on_tpu = jax.devices()[0].platform == "tpu"
    n = args.rows if on_tpu else 20_000
    fp32_resident = n <= 4_000_000   # engine residency policy class

    # device-side corpus generation, chunked, written into
    # preallocated destinations with DONATED in-place updates (a
    # concatenate would transiently double the 7.7 GB int8 shadow at
    # 10M — an HBM OOM on a 16 GB chip)
    import functools

    @functools.partial(jax.jit, donate_argnums=(0,))
    def _put(dst, c, s):
        return jax.lax.dynamic_update_slice(dst, c, (s, 0))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def _put1(dst, c, s):
        return jax.lax.dynamic_update_slice(dst, c, (s,))

    key = jax.random.PRNGKey(0)
    mu = jnp.zeros((D,), jnp.float32)   # zero-mean synthetic corpus
    corpus_i8 = jnp.zeros((n, D), jnp.int8)
    rinv = jnp.zeros((n,), jnp.float32)
    corpus = jnp.zeros((n, D), jnp.float32) if fp32_resident else None
    for s in range(0, n, CHUNK):
        c = min(CHUNK, n - s)
        key, kc = jax.random.split(key)
        v = normalize_rows(jax.random.normal(kc, (c, D), jnp.float32))
        rmax = jnp.max(jnp.abs(v - mu[None, :]), axis=1)
        rs = 127.0 / jnp.maximum(rmax, 1e-12)
        q = jnp.clip(jnp.round((v - mu[None, :]) * rs[:, None]),
                     -127, 127).astype(jnp.int8)
        corpus_i8 = _put(corpus_i8, q, s)
        rinv = _put1(rinv, (1.0 / rs).astype(jnp.float32), s)
        if fp32_resident:
            corpus = _put(corpus, v, s)
        del v, q
    wait_ready(corpus_i8, 600.0)
    if fp32_resident:
        wait_ready(corpus, 600.0)
    bias = jnp.zeros((n,), jnp.float32)
    mode = ("int8 scan + fused device fp32 re-rank" if fp32_resident
            else "int8 candidate scan (quant-only residency; host "
                 "re-rank leg measured separately)")

    for B in (1, 8, 64):
        kq = jax.random.PRNGKey(100 + B)
        q = normalize_rows(jax.random.normal(kq, (B, D), jnp.float32))

        if fp32_resident:
            def run(q=q):
                return cosine_topk_quant_exact(
                    corpus_i8, rinv, corpus, q, K, CAND, bias,
                    over=OVER)
        else:
            def run(q=q):
                return cosine_topk_quant(corpus_i8, rinv, q, CAND,
                                         bias, over=OVER)

        out = run()
        wait_ready(out[1], 600.0)          # compile + settle

        # sequential per-dispatch latency (transport included)
        lats = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            out = run()
            _fetch_array(out[1], 120.0)
            lats.append((time.perf_counter() - t0) * 1e3)
        lats.sort()
        p = {q_: lats[min(len(lats) - 1, int(q_ * len(lats)))]
             for q_ in (0.5, 0.95, 0.99)}
        emit(f"flat@{n} batch-{B} e2e dispatch latency ({mode})",
             p[0.5], "ms p50",
             p95=round(p[0.95], 3), p99=round(p[0.99], 3))

        # pipelined device time (transport amortized)
        t0 = time.perf_counter()
        for _ in range(ROUNDS - 1):
            run()
        out = run()
        wait_ready(out[1], 120.0)
        dt = (time.perf_counter() - t0) / ROUNDS
        emit(f"flat@{n} batch-{B} device time (pipelined)",
             dt * 1e3, "ms/batch",
             qps=round(B / dt, 1))


if __name__ == "__main__":
    main()
