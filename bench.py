"""Headline benchmark: batched cosine top-10 search QPS at 1M x 768d
on one chip (BASELINE config #3 / the north-star metric).

Baseline: the reference claims top-10 vector search in <10 ms on CPU
(ARCHITECTURE.md:306) => 100 QPS for a single-threaded query stream.
vs_baseline = our QPS / 100, at the reported measured recall.

Candidates (see cortex_tpu/ops/similarity.py for the engineering story):
  xla         — exact matmul + top_k (fp32 corpus, default precision)
  approx-bf16 — bf16 corpus + hardware PartialReduce + exact merge
  quant-int8+device-rerank — the engine's serving path (DeviceCorpus
                "auto" on TPU with the fp32 corpus device-resident):
                int8 corpus scan producing a candidate block, then an
                EXACT fp32 re-rank of the candidates ON DEVICE (gather
                + Precision.HIGHEST einsum, fused into the same
                program). ONE dispatch per batch, no host leg. Final
                scores are true fp32 cosines — recall 1.0 against a
                genuinely fp32 oracle. (r2 ran this re-rank on the
                host; r3 re-measured XLA's candidate gather at serving
                shapes — 0.057 ms vs the assumed serial-slice lowering
                — and moved it on-device, which also unlocks batch 512:
                the host leg capped sustained at ~25k there.)

Protocol: dispatch ROUNDS batches back-to-back and fetch only the LAST
result (device execution is in-order, so that fetch drains the
pipeline; np.asarray is the drain — block_until_ready is a no-op behind
a remote-dispatch transport). Per-batch result fetches through a
network-tunneled TPU cost a full RTT (~30 ms) that no real deployment
pays, so a naive end-to-end loop here measures the tunnel, not the
engine.

Recall is measured against the fp32-exact oracle (device matmul at
Precision.HIGHEST — verified to agree 1.000 with a chunked numpy fp32
scan at this scale; the DEFAULT-precision device matmul only agrees
0.997, which is why recall numbers vs a default-precision "oracle"
flatter the bf16 paths).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

N, D, B, K = 1_000_000, 768, 64, 10
CAND, OVER = 64, 512        # engine quant-path defaults (r3: recall-robust
#                             at every batch size — see shard._cand_count)
BASELINE_QPS = 100.0        # reference CPU claim: <10ms per top-10 query
ROUNDS = 60                 # long enough that per-dispatch transport
#                             jitter (tunneled TPUs) averages out


def main():
    from cortex_tpu.ops.similarity import (cosine_topk_approx,
                                           cosine_topk_quant_exact,
                                           cosine_topk_xla, normalize_rows)
    # bounded first-backend-touch: a wedged tunnel otherwise hangs this
    # process forever in native code with zero output (observed live);
    # fail loudly so the driver records an error, not a timeout
    from cortex_tpu.utils.device import preflight_device
    preflight_device()

    on_tpu = jax.devices()[0].platform == "tpu"
    n = N if on_tpu else 20_000     # CPU smoke path for dev runs

    # generate the corpus on-device (no host->device 3GB upload)
    key = jax.random.PRNGKey(0)
    kc, kq = jax.random.split(key)
    corpus = normalize_rows(jax.random.normal(kc, (n, D), jnp.float32))
    corpus.block_until_ready()
    corpus_bf16 = corpus.astype(jnp.bfloat16)
    corpus_bf16.block_until_ready()
    # int8 shadow (per-row scales, CENTERED as DeviceCorpus quantizes —
    # ranking-invariant; a no-op for this zero-mean corpus but the exact
    # serving scheme) — computed on device to avoid the host round-trip
    centered = corpus - jnp.mean(corpus, axis=0)[None, :]
    rmax = jnp.max(jnp.abs(centered), axis=1)
    rscale = 127.0 / jnp.maximum(rmax, 1e-12)
    corpus_i8 = jnp.clip(jnp.round(centered * rscale[:, None]),
                         -127, 127).astype(jnp.int8)
    rinv = (1.0 / rscale).astype(jnp.float32)
    corpus_i8.block_until_ready()
    del centered
    queries = normalize_rows(jax.random.normal(kq, (B, D), jnp.float32))
    bias = jnp.zeros((1, n), jnp.float32)
    bias1d = jnp.zeros((n,), jnp.float32)

    # fp32-exact oracle
    ref_top = np.asarray(jax.lax.top_k(
        jnp.dot(queries, corpus.T, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST), K)[1])

    def run_xla():
        return cosine_topk_xla(corpus, queries, K, bias)

    def run_approx_bf16():
        return cosine_topk_approx(corpus_bf16, queries, K, bias)

    def run_quant_exact(q=None):
        return cosine_topk_quant_exact(
            corpus_i8, rinv, corpus, queries if q is None else q,
            K, CAND, bias1d, over=OVER)

    def timed_device(fn, drain_col=0):
        out = fn()
        np.asarray(out[drain_col])     # compile + settle
        t0 = time.perf_counter()
        for _ in range(ROUNDS - 1):
            fn()
        out = fn()
        np.asarray(out[drain_col])     # drains the in-order stream
        dt = time.perf_counter() - t0
        return ROUNDS * out[drain_col].shape[0] / dt, out

    def run_and_recall(name, fn):
        qps, got = fn()
        got = np.asarray(got)
        recall = float(np.mean([len(set(ref_top[r]) & set(got[r])) / K
                                for r in range(B)]))
        print(f"# {name}: {qps:.1f} qps, recall@10={recall:.4f} "
              f"(vs fp32-exact oracle)", file=sys.stderr)
        return qps, recall

    results = {}
    try:
        qps, out = timed_device(run_xla)
        results["xla"] = run_and_recall("xla", lambda: (qps, out[1]))
    except Exception as e:  # noqa: BLE001
        print(f"# xla: FAILED {e!r}", file=sys.stderr)
    if on_tpu:
        try:
            qps, out = timed_device(run_approx_bf16)
            results["approx-bf16"] = run_and_recall(
                "approx-bf16", lambda: (qps, out[1]))
        except Exception as e:  # noqa: BLE001
            print(f"# approx-bf16: FAILED {e!r}", file=sys.stderr)
        try:
            qps, out = timed_device(run_quant_exact, drain_col=1)
            results["quant-int8+device-rerank"] = run_and_recall(
                "quant-int8+device-rerank", lambda: (qps, out[1]))
        except Exception as e:  # noqa: BLE001
            print(f"# quant-exact: FAILED {e!r}", file=sys.stderr)
        # large-batch leg (the r2 verdict's 5x headroom item): same
        # fused path at batch 512 — reported in stderr + BASELINE.md;
        # the headline JSON stays batch-64 for round-over-round
        # comparability
        try:
            kq512 = jax.random.PRNGKey(7)
            q512 = normalize_rows(jax.random.normal(kq512, (512, D),
                                                    jnp.float32))
            ref512 = np.asarray(jax.lax.top_k(
                jnp.dot(q512, corpus.T,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST), K)[1])
            qps512, out = timed_device(lambda: run_quant_exact(q512),
                                       drain_col=1)
            got = np.asarray(out[1])
            rec512 = float(np.mean([
                len(set(ref512[r]) & set(got[r])) / K
                for r in range(512)]))
            print(f"# quant-int8+device-rerank @ batch 512: "
                  f"{qps512:.1f} qps, recall@10={rec512:.4f}",
                  file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            print(f"# batch-512 leg: FAILED {e!r}", file=sys.stderr)

    # headline: fastest path holding recall >= 0.999 vs the exact oracle
    best_qps, best_name, best_rec = 0.0, "xla", 0.0
    for name, (qps, rec) in results.items():
        if qps > best_qps and rec >= 0.999:
            best_qps, best_name, best_rec = qps, name, rec
    if best_qps == 0.0 and results:      # nothing held the gate; report best
        best_name = max(results, key=lambda m: results[m][0])
        best_qps, best_rec = results[best_name]

    print(json.dumps({
        "metric": f"cosine top-{K} QPS @ {n}x{D} (batch {B}, "
                  f"{best_name}, recall@10={best_rec:.3f} vs fp32-exact)",
        "value": round(best_qps, 1),
        "unit": "queries/sec",
        "vs_baseline": round(best_qps / BASELINE_QPS, 2),
    }))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001 — keep the one-JSON-line contract
        from cortex_tpu.errors import DeviceUnavailable
        if not isinstance(e, DeviceUnavailable):
            raise
        # a wedged device transport (observed live r3, multi-hour
        # outage): record a structured, honest line instead of a
        # traceback — value 0 plus an explicit unavailability marker,
        # with the last MEASURED number referenced in BASELINE.md
        print(json.dumps({
            "metric": "cosine top-10 QPS @ 1Mx768 (batch 64) — "
                      "DEVICE UNAVAILABLE, not measured this run",
            "value": 0,
            "unit": f"device backend unreachable: {e}; last measured "
                    "32.4k QPS @64 / 90.3k @512 recall 1.0000 "
                    "(BASELINE.md, pre-outage)",
            "vs_baseline": 0,
        }))
        sys.exit(1)
