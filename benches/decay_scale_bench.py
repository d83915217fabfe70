"""Decay + retention sweeps at the 10M scale (BASELINE config #5).

The reference claims ~100ms per 10k edges for its per-edge decay loop
(ARCHITECTURE.md:309 => ~100k edges/s) and caps at ~100M edges on one
machine. This bench measures the device sweep (ops/decay.py) over
10M+ device-resident edges and retention eligibility over 10M nodes —
the exact kernels DecayEngine/RetentionEngine dispatch above
DEVICE_SWEEP_MIN_EDGES.

Arrays are generated ON DEVICE (a 10M-edge upload through a tunneled
TPU would measure the tunnel, not the sweep). Two numbers per kernel:

  compute   pipelined device rate (result masks stay on device; this is
            the steady-state rate when sweeps chain into the partition/
            compaction step, which also runs on device)
  e2e       one dispatch + full mask fetch to host (what the current
            DecayEngine pays per sweep, including transport)

Run: python benches/decay_scale_bench.py [--edges 10000000]
Prints one JSON line per measurement.
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

from cortex_tpu.ops.decay import decay_sweep, retention_eligibility

ROUNDS = 20


def gen_edges(e, seed=0):
    k = jax.random.PRNGKey(seed)
    k1, k2, k3, k4 = jax.random.split(k, 4)
    weights = jax.random.uniform(k1, (e,), jnp.float32, 0.01, 1.0)
    days = jax.random.uniform(k2, (e,), jnp.float32, 0.0, 400.0)
    imp = jax.random.uniform(k3, (e,), jnp.float32, 0.0, 1.0)
    exempt = jax.random.bernoulli(k4, 0.1, (e,))
    return weights, days, imp, exempt


def bench_decay(e):
    weights, days, imp, exempt = gen_edges(e)
    args = (jnp.float32(0.01), jnp.float32(0.8),
            jnp.float32(0.05), jnp.float32(0.1))
    # warm BOTH programs (sweep + the scalar slice used as the drain):
    # behind the axon tunnel block_until_ready is a no-op, so the only
    # honest sync is fetching a value that depends on the computation
    out = decay_sweep(weights, days, imp, exempt, *args)
    np.asarray(out[0][-1])

    t0 = time.perf_counter()
    for i in range(ROUNDS):
        out = decay_sweep(out[0], days, imp, exempt, *args)
    np.asarray(out[0][-1])                           # drain the pipeline
    dt = time.perf_counter() - t0
    compute_rate = ROUNDS * e / dt
    print(json.dumps({
        "metric": f"decay sweep {e} edges (device compute)",
        "value": round(compute_rate / 1e6, 2), "unit": "M edges/sec",
        "vs_baseline": round(compute_rate / 100_000, 1)}), flush=True)

    t0 = time.perf_counter()
    out = decay_sweep(weights, days, imp, exempt, *args)
    host = [np.asarray(x) for x in out]              # full mask fetch
    dt = time.perf_counter() - t0
    n_del = int(host[1].sum())
    print(json.dumps({
        "metric": f"decay sweep {e} edges (e2e incl. mask fetch)",
        "value": round(e / dt / 1e6, 2), "unit": "M edges/sec",
        "deleted": n_del,
        "vs_baseline": round(e / dt / 100_000, 1)}), flush=True)


def bench_retention(n):
    k = jax.random.PRNGKey(1)
    k1, k2, k3, k4 = jax.random.split(k, 4)
    now = 1.7e9
    created = now - jax.random.uniform(k1, (n,), jnp.float32) * 86400 * 365
    accessed = created + jax.random.uniform(k2, (n,), jnp.float32) * 86400 * 90
    imp = jax.random.uniform(k3, (n,), jnp.float32)
    inbound = jax.random.bernoulli(k4, 0.5, (n,))
    args = (jnp.float32(now), jnp.float32(90.0), jnp.float32(30.0),
            jnp.float32(0.3), jnp.bool_(True))
    out = retention_eligibility(created, accessed, imp, inbound, *args)
    np.asarray(out[-1])                              # warm sweep + drain

    t0 = time.perf_counter()
    for _ in range(ROUNDS):
        out = retention_eligibility(created, accessed, imp, inbound, *args)
    np.asarray(out[-1])
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": f"retention eligibility {n} nodes (device compute)",
        "value": round(ROUNDS * n / dt / 1e6, 2), "unit": "M nodes/sec",
        "expirable": int(np.asarray(out).sum())}), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=10_000_000)
    ap.add_argument("--nodes", type=int, default=10_000_000)
    args = ap.parse_args()
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}),
          flush=True)
    bench_decay(args.edges)
    bench_retention(args.nodes)


if __name__ == "__main__":
    main()
