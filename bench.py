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
                genuinely fp32 oracle.

Protocol: dispatch ROUNDS batches back-to-back and fetch only the LAST
result (device execution is in-order, so that fetch drains the
pipeline). Per-batch result fetches through a network-tunneled TPU
cost a full RTT (~30 ms) that no real deployment pays, so a naive
end-to-end loop here measures the tunnel, not the engine.

Recall is measured against the fp32-exact oracle (device matmul at
Precision.HIGHEST — verified to agree 1.000 with a chunked numpy fp32
scan at this scale; the DEFAULT-precision device matmul only agrees
0.997, which is why recall numbers vs a default-precision "oracle"
flatter the bf16 paths).

Wedge posture (the round-3 lesson: BENCH_r03.json is rc=124 with zero
output because one raw np.asarray blocked ~30 min through a wedged
tunnel). Three defenses, layered:
  1. every device wait/fetch goes through the engine's own watchdogs
     (vector/shard.py _fetch_array / wait_ready) — a lost response
     raises DeviceFetchTimeout instead of blocking forever; timed
     paths re-dispatch ONCE, then degrade to a FAILED line;
  2. a provisional headline JSON line is flushed to stdout after EVERY
     measured path (last line wins), so a wedge mid-run still leaves
     the driver a parsed number for everything already measured;
  3. a total wall-clock deadline (BENCH_DEADLINE_S, default 1020 s —
     well under the driver's ~30 min kill) skips remaining paths and
     exits 0 with best-so-far; two consecutive wedged paths abort the
     same way (a dead transport won't revive for path 4).

Output contract: stdout carries ONLY whole JSON lines of the form
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}, flushed
one write at a time; the LAST line is the headline. Commentary goes to
stderr. tests/test_bench_contract.py kills this process at arbitrary
moments and asserts every complete stdout line parses.
"""

import json
import os
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

#: total wall-clock budget; the driver kills the process at ~30 min,
#: so the bench must conclude (with best-so-far) well before that
DEADLINE_S = float(os.environ.get("BENCH_DEADLINE_S", "1020"))
#: bound for a fetch whose program may still be compiling (cold XLA
#: compile on a tunneled TPU: ~20-40 s; the corpus-setup chain and the
#: oracle also pay one-time compiles)
COMPILE_TIMEOUT_S = 240.0
#: bound for a warm drain (ROUNDS in-order executions + one RTT)
DRAIN_TIMEOUT_S = 90.0

_T0 = time.monotonic()


def _remaining() -> float:
    return DEADLINE_S - (time.monotonic() - _T0)


def _note(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def _emit(results: dict, n: int) -> None:
    """Flush the current-best headline line. Called after every
    measured path: the last line on stdout is always the best
    measurement so far, so a later wedge costs nothing already won."""
    best_qps, best_name, best_rec = 0.0, "none", 0.0
    for name, (qps, rec) in results.items():
        if qps > best_qps and rec >= 0.999:
            best_qps, best_name, best_rec = qps, name, rec
    if best_qps == 0.0 and results:  # nothing held the gate; report best
        best_name = max(results, key=lambda m: results[m][0])
        best_qps, best_rec = results[best_name]
    line = json.dumps({
        "metric": f"cosine top-{K} QPS @ {n}x{D} (batch {B}, "
                  f"{best_name}, recall@10={best_rec:.3f} vs fp32-exact)",
        "value": round(best_qps, 1),
        "unit": "queries/sec",
        "vs_baseline": round(best_qps / BASELINE_QPS, 2),
    })
    # one write, newline included: a kill can truncate at most the
    # line being written, never interleave or split earlier ones
    sys.stdout.write(line + "\n")
    sys.stdout.flush()


def _emit_unmeasured(why: str) -> None:
    sys.stdout.write(json.dumps({
        "metric": "cosine top-10 QPS @ 1Mx768 (batch 64) — "
                  "DEVICE UNAVAILABLE, not measured this run",
        "value": 0,
        "unit": f"{why}; last measured 32.4k QPS @64 / 90.3k @512 "
                "recall 1.0000 (BASELINE.md)",
        "vs_baseline": 0,
    }) + "\n")
    sys.stdout.flush()


def main():
    if os.environ.get("BENCH_FORCE_CPU"):
        # dev/test smoke runs: the axon sitecustomize pins
        # jax_platforms at interpreter boot, so the plain env var
        # cannot force CPU — override before any backend initializes
        jax.config.update("jax_platforms", "cpu")
    from cortex_tpu.ops.similarity import (cosine_topk_approx,
                                           cosine_topk_quant_exact,
                                           cosine_topk_xla, normalize_rows)
    from cortex_tpu.vector.shard import (DeviceFetchTimeout, _fetch_array,
                                         wait_ready)
    # bounded first-backend-touch: a wedged tunnel otherwise hangs this
    # process forever in native code with zero output (observed live)
    from cortex_tpu.utils.device import preflight_device
    preflight_device()

    on_tpu = jax.devices()[0].platform == "tpu"
    n = N if on_tpu else 20_000     # CPU smoke path for dev runs

    # generate the corpus on-device (no host->device 3GB upload); every
    # settle is watchdogged — r3's wedge began exactly here, after a
    # passing preflight
    def phase(msg):
        _note(f"# t+{time.monotonic() - _T0:.0f}s {msg}")

    key = jax.random.PRNGKey(0)
    kc, kq = jax.random.split(key)
    corpus = normalize_rows(jax.random.normal(kc, (n, D), jnp.float32))
    wait_ready(corpus, COMPILE_TIMEOUT_S)
    phase("corpus generated")
    corpus_bf16 = corpus.astype(jnp.bfloat16)
    wait_ready(corpus_bf16, COMPILE_TIMEOUT_S)
    phase("bf16 cast settled")
    # int8 shadow (per-row scales, CENTERED as DeviceCorpus quantizes —
    # ranking-invariant; a no-op for this zero-mean corpus but the exact
    # serving scheme) — computed on device to avoid the host round-trip
    centered = corpus - jnp.mean(corpus, axis=0)[None, :]
    rmax = jnp.max(jnp.abs(centered), axis=1)
    rscale = 127.0 / jnp.maximum(rmax, 1e-12)
    corpus_i8 = jnp.clip(jnp.round(centered * rscale[:, None]),
                         -127, 127).astype(jnp.int8)
    rinv = (1.0 / rscale).astype(jnp.float32)
    wait_ready(corpus_i8, COMPILE_TIMEOUT_S)
    phase("int8 shadow settled")
    del centered
    queries = normalize_rows(jax.random.normal(kq, (B, D), jnp.float32))
    bias = jnp.zeros((1, n), jnp.float32)
    bias1d = jnp.zeros((n,), jnp.float32)

    # fp32-exact oracle
    ref_top = _fetch_array(jax.lax.top_k(
        jnp.dot(queries, corpus.T, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST), K)[1],
        COMPILE_TIMEOUT_S)
    phase("fp32-exact oracle done")

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
        wait_ready(out[drain_col], COMPILE_TIMEOUT_S)  # compile + settle
        t0 = time.perf_counter()
        for _ in range(ROUNDS - 1):
            fn()
        out = fn()
        wait_ready(out[drain_col], DRAIN_TIMEOUT_S)  # drains the stream
        dt = time.perf_counter() - t0
        return ROUNDS * out[drain_col].shape[0] / dt, out

    def timed_with_retry(fn, drain_col=0):
        """One re-dispatch on a lost response (the program is compiled
        by then; a second loss means the transport is gone)."""
        try:
            return timed_device(fn, drain_col)
        except DeviceFetchTimeout:
            _note("# fetch watchdog tripped; re-dispatching once")
            return timed_device(fn, drain_col)

    def recall_vs(ref, got_dev, nq):
        got = _fetch_array(got_dev, DRAIN_TIMEOUT_S)
        return float(np.mean([len(set(ref[r]) & set(got[r])) / K
                              for r in range(nq)]))

    def rtt_probe(reps: int = 20) -> list:
        """Measured per-dispatch round-trip times (seconds) for a
        scalar-sized program — the transport-jitter trace VERDICT r4
        #8 asks for alongside the headline, so the 24.7-38k QPS band
        across rounds is attributable to the tunnel with data instead
        of narrative. Stderr-only (the stdout JSON contract carries
        the headline)."""
        ts = []
        x = jnp.zeros((8,), jnp.float32)
        _fetch_array(x + 1.0, COMPILE_TIMEOUT_S)    # compile outside
        for _ in range(reps):
            t0 = time.perf_counter()
            _fetch_array(x + 1.0, DRAIN_TIMEOUT_S)
            ts.append(time.perf_counter() - t0)
        s = sorted(ts)
        _note(f"# rtt probe ({reps} reps): min {s[0]*1e3:.1f} ms, "
              f"p50 {s[len(s)//2]*1e3:.1f} ms, "
              f"p95 {s[int(0.95*len(s))]*1e3:.1f} ms, "
              f"max {s[-1]*1e3:.1f} ms")
        return ts

    results = {}
    wedged_paths = 0
    if on_tpu:
        try:
            rtt_probe()
        except Exception as e:  # noqa: BLE001 — probe is best-effort
            _note(f"# rtt probe FAILED {e!r}")

    paths = [("xla", run_xla, 0)]
    if on_tpu:
        paths += [("approx-bf16", run_approx_bf16, 0),
                  ("quant-int8+device-rerank", run_quant_exact, 1)]
    for name, fn, drain_col in paths:
        if _remaining() < 60:
            _note(f"# {name}: SKIPPED (deadline, "
                  f"{_remaining():.0f}s left)")
            continue
        if wedged_paths >= 2:
            _note(f"# {name}: SKIPPED (transport wedged twice)")
            continue
        try:
            qps, out = timed_with_retry(fn, drain_col)
            rec = recall_vs(ref_top, out[1], B)
            results[name] = (qps, rec)
            _note(f"# {name}: {qps:.1f} qps, recall@10={rec:.4f} "
                  f"(vs fp32-exact oracle)")
            wedged_paths = 0
            _emit(results, n)
        except DeviceFetchTimeout as e:
            wedged_paths += 1
            _note(f"# {name}: WEDGED {e!r}")
        except Exception as e:  # noqa: BLE001
            _note(f"# {name}: FAILED {e!r}")

    # headline variance capture (VERDICT r4 #8): re-run the winning
    # path several times in THIS process and report the spread next to
    # a fresh RTT probe — one run per round left the 24.7-38k band
    # attributed by narrative only
    if (on_tpu and "quant-int8+device-rerank" in results
            and wedged_paths < 2 and _remaining() > 240):
        reps = [results["quant-int8+device-rerank"][0]]
        try:
            for _ in range(4):
                if _remaining() < 120:
                    break
                qps_i, _o = timed_device(run_quant_exact, 1)
                reps.append(qps_i)
            rs = sorted(reps)
            med = rs[len(rs) // 2]
            _note(f"# headline spread over {len(reps)} captures: "
                  f"{[round(r, 0) for r in reps]} qps — min "
                  f"{rs[0]:.0f} / median {med:.0f} / max {rs[-1]:.0f} "
                  f"(rel spread {(rs[-1] - rs[0]) / med * 100:.1f}%)")
            rtt_probe()
            # report the MEDIAN of the captures as the headline (one
            # draw per round is what produced the unexplained band)
            best = results["quant-int8+device-rerank"]
            results["quant-int8+device-rerank"] = (med, best[1])
            _emit(results, n)
        except DeviceFetchTimeout:
            _note("# variance capture wedged; keeping first measurement")
        except Exception as e:  # noqa: BLE001
            _note(f"# variance capture FAILED {e!r}")

    # large-batch leg (the r2 verdict's 5x headroom item): same fused
    # path at batch 512 — reported on stderr + BASELINE.md; the
    # headline JSON stays batch-64 for round-over-round comparability
    if (on_tpu and "quant-int8+device-rerank" in results
            and wedged_paths < 2 and _remaining() > 90):
        try:
            kq512 = jax.random.PRNGKey(7)
            q512 = normalize_rows(jax.random.normal(kq512, (512, D),
                                                    jnp.float32))
            ref512 = _fetch_array(jax.lax.top_k(
                jnp.dot(q512, corpus.T,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST), K)[1],
                COMPILE_TIMEOUT_S)
            qps512, out = timed_with_retry(
                lambda: run_quant_exact(q512), drain_col=1)
            rec512 = recall_vs(ref512, out[1], 512)
            _note(f"# quant-int8+device-rerank @ batch 512: "
                  f"{qps512:.1f} qps, recall@10={rec512:.4f}")
        except Exception as e:  # noqa: BLE001
            _note(f"# batch-512 leg: FAILED {e!r}")

    if results:
        _emit(results, n)       # final line == best measurement
    else:
        _emit_unmeasured("no path completed a measurement "
                         "(wedged transport or deadline)")


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001 — keep the JSON-lines contract
        from cortex_tpu.errors import DeviceUnavailable
        from cortex_tpu.vector.shard import DeviceFetchTimeout
        if not isinstance(e, (DeviceUnavailable, DeviceFetchTimeout)):
            raise
        # a wedged device transport (observed live r3, multi-hour
        # outage): record a structured, honest line instead of a
        # traceback — value 0 plus an explicit unavailability marker,
        # with the last MEASURED number referenced in BASELINE.md
        _emit_unmeasured(f"device backend unreachable: {e}")
        sys.exit(1)
