"""Headline benchmark: batched exact cosine top-10 search QPS at 1M x 768d
on one chip (BASELINE config #3 / the north-star metric).

Baseline: the reference claims top-10 vector search in <10 ms on CPU
(ARCHITECTURE.md:306) => 100 QPS for a single-threaded query stream.
vs_baseline = our (exact, recall=1.0) QPS / 100.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

N, D, B, K = 1_000_000, 768, 64, 10
BASELINE_QPS = 100.0        # reference CPU claim: <10ms per top-10 query
ROUNDS = 60                 # long enough that per-dispatch transport
#                             jitter (tunneled TPUs) averages out


def main():
    from cortex_tpu.ops.similarity import (cosine_topk_approx,
                                           cosine_topk_pallas,
                                           cosine_topk_xla, normalize_rows)

    on_tpu = jax.devices()[0].platform == "tpu"
    n = N if on_tpu else 20_000     # CPU smoke path for dev runs

    # generate the corpus on-device (no host->device 3GB upload)
    key = jax.random.PRNGKey(0)
    kc, kq = jax.random.split(key)
    corpus = normalize_rows(jax.random.normal(kc, (n, D), jnp.float32))
    corpus.block_until_ready()
    corpus_bf16 = corpus.astype(jnp.bfloat16)
    corpus_bf16.block_until_ready()
    queries = normalize_rows(jax.random.normal(kq, (B, D), jnp.float32))
    bias = jnp.zeros((1, n), jnp.float32)

    # Throughput protocol: dispatch ROUNDS batches back-to-back and fetch
    # only the LAST result to host. Device execution is in-order, so the
    # final tiny [B,K] fetch bounds the whole pipeline — this measures
    # sustained serving throughput, not per-call transport latency (and
    # stays honest even when block_until_ready is a no-op behind a
    # remote-dispatch transport).
    def run_xla():
        return cosine_topk_xla(corpus, queries, K, bias)

    def run_pallas_bf16():
        # bf16 corpus storage halves HBM traffic (the flat-scan
        # bottleneck); MXU accumulates fp32
        return cosine_topk_pallas(corpus_bf16, queries, K, bias)

    def run_approx_bf16():
        # hardware PartialReduce top-k with 256-candidate over-fetch +
        # exact merge; measured recall 1.0 at this scale (see recall
        # check below, computed against the fp32 exact oracle)
        return cosine_topk_approx(corpus_bf16, queries, K, bias)

    candidates = {"xla": run_xla}
    if on_tpu:
        candidates["pallas-bf16"] = run_pallas_bf16
        candidates["approx-bf16"] = run_approx_bf16

    best_qps, best_name = 0.0, "xla"
    for name, fn in candidates.items():
        try:
            np.asarray(fn()[0])       # compile + settle
            t0 = time.perf_counter()
            for _ in range(ROUNDS - 1):
                fn()
            v, i = fn()
            np.asarray(v)             # drains the in-order stream
            dt = time.perf_counter() - t0
            qps = ROUNDS * B / dt
            print(f"# {name}: {qps:.1f} qps", file=sys.stderr)
            if qps > best_qps:
                best_qps, best_name = qps, name
        except Exception:  # noqa: BLE001 — a failing variant never kills bench
            continue

    # recall at bench scale vs the fp32 exact oracle, over the full batch
    v, i = candidates[best_name]()
    ref_top = np.asarray(jax.lax.top_k(
        jnp.dot(queries, corpus.T,
                preferred_element_type=jnp.float32), K)[1])
    got = np.asarray(i)
    recall = float(np.mean([len(set(ref_top[r]) & set(got[r])) / K
                            for r in range(B)]))

    print(json.dumps({
        "metric": f"cosine top-{K} QPS @ {n}x{D} (batch {B}, "
                  f"{best_name}, measured recall@10={recall:.3f})",
        "value": round(best_qps, 1),
        "unit": "queries/sec",
        "vs_baseline": round(best_qps / BASELINE_QPS, 2),
    }))


if __name__ == "__main__":
    main()
