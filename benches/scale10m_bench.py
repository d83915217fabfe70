"""10M x 768 search — 10x past the reference's vector ceiling
(VERDICT r2 #2; reference limit: ~1M vectors, ARCHITECTURE.md:314).

At 10M rows the fp32 corpus is 30 GB and cannot sit in a 16 GB HBM, so
the engine runs QUANT-ONLY residency (DeviceCorpus._emb_fits): the
centered int8 shadow (7.7 GB) + filter masks live on device, the fp32
mirror stays on host, and the exact re-rank runs on the host against
that mirror (the r2 serving scheme; the r3 device re-rank needs fp32
residency and turns itself off here).

Everything is generated ON DEVICE in 1M-row chunks (a 30 GB upload
through a tunneled TPU would bench the transport):
  pass 1: per-chunk means -> global centering shift mu
  pass 2: regenerate each chunk (same fold_in key), center, quantize
          -> int8 shadow assembled in place

Measured:
  * int8 candidate-scan QPS at batch 64 / 512 (pipelined dispatch,
    single drain — the device leg of the 10M serving path)
  * host exact re-rank ms/batch against a 30 GB host mirror (the host
    leg; random fill — gather/BLAS cost depends on layout, not values)
  * sustained = min(device leg, host leg) per batch size
  * recall@10 of the full serving scheme vs the fp32-exact oracle,
    computed chunk-wise on device (oracle: Precision.HIGHEST matmul;
    serving: exact scores gathered at the int8 scan's candidates) —
    no 30 GB transfer anywhere

Run: python benches/scale10m_bench.py [--rows 10000000]
Prints one JSON line per measurement.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if "--cpu" in sys.argv:      # must precede backend init; the JAX_PLATFORMS
    import jax               # env var is overridden in some images
    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp

from cortex_tpu.ops.similarity import NEG_INF, normalize_rows

CHUNK = int(os.environ.get("SCALE10M_CHUNK", 1_000_000))
D = 768
K = 10
CAND, OVER = 64, 512          # engine quant-path defaults
ROUNDS = int(os.environ.get("SCALE10M_ROUNDS", 30))


def emit(metric, value, unit, vs=None):
    # 4 decimals: a recall of 0.9998 must not round to a claimed 1.0
    row = {"metric": metric, "value": round(float(value), 4), "unit": unit}
    if vs is not None:
        row["vs_baseline"] = round(float(vs), 2)
    print(json.dumps(row), flush=True)


@jax.jit
def _gen_chunk(key):
    return normalize_rows(jax.random.normal(key, (CHUNK, D), jnp.float32))


@jax.jit
def _chunk_mean(key):
    return jnp.mean(_gen_chunk(key), axis=0)


@jax.jit
def _quantize_chunk(key, mu):
    x = _gen_chunk(key) - mu[None, :]
    rmax = jnp.max(jnp.abs(x), axis=1)
    rscale = 127.0 / jnp.maximum(rmax, 1e-12)
    q = jnp.clip(jnp.round(x * rscale[:, None]), -127, 127).astype(jnp.int8)
    return q, (1.0 / rscale).astype(jnp.float32)


def build_corpus(n_rows, base_key):
    chunks = n_rows // CHUNK
    keys = [jax.random.fold_in(base_key, c) for c in range(chunks)]
    mu = jnp.mean(jnp.stack([_chunk_mean(k) for k in keys]), axis=0)
    mu.block_until_ready()
    corpus_i8 = jnp.zeros((n_rows, D), jnp.int8)
    rinv = jnp.zeros((n_rows,), jnp.float32)
    for c, k in enumerate(keys):
        q, ri = _quantize_chunk(k, mu)
        corpus_i8 = jax.lax.dynamic_update_slice(corpus_i8, q, (c * CHUNK, 0))
        rinv = jax.lax.dynamic_update_slice(rinv, ri, (c * CHUNK,))
    corpus_i8.block_until_ready()
    return corpus_i8, rinv, mu, keys


import functools


@functools.partial(jax.jit, static_argnames=("cand", "over"))
def quant_scan(corpus_i8, rinv, queries, cand, over):
    qmax = jnp.max(jnp.abs(queries), axis=1)
    qs = 127.0 / jnp.maximum(qmax, 1e-12)
    qi8 = jnp.clip(jnp.round(queries * qs[:, None]), -127, 127
                   ).astype(jnp.int8)
    s32 = jax.lax.dot_general(qi8, corpus_i8, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.int32)
    s = s32.astype(jnp.float32) * (rinv[None, :] / qs[:, None])
    v, i = jax.lax.approx_max_k(s, over, recall_target=0.95,
                                aggregate_to_topk=False)
    v2, sel = jax.lax.top_k(v, cand)
    return v2, jnp.take_along_axis(i, sel, axis=1)


@jax.jit
def _chunk_exact(key, queries):
    """[B, CHUNK] fp32-exact scores for one regenerated chunk."""
    x = _gen_chunk(key)
    return jnp.einsum("bd,nd->bn", queries, x,
                      precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=jnp.float32)


def exact_oracle_and_candidate_scores(keys, queries, cand_rows):
    """Chunk-wise: fp32-exact global top-K ids AND exact scores at the
    candidate rows, without materializing the corpus anywhere. Query
    slices of <=128 bound the [b, CHUNK] score block to ~0.5 GB beside
    the regenerated 3 GB chunk and the resident int8 shadow."""
    b = queries.shape[0]
    run_i = np.zeros((b, K), np.int64)
    cand_scores = np.full(cand_rows.shape, -np.inf, np.float32)
    step = 128
    for q0 in range(0, b, step):
        qs = queries[q0:q0 + step]
        bb = qs.shape[0]
        run_v_s = np.full((bb, K), -np.inf, np.float32)
        run_i_s = np.zeros((bb, K), np.int64)
        for c, key in enumerate(keys):
            s = _chunk_exact(key, qs)           # [bb, CHUNK] on device
            v, i = jax.lax.top_k(s, K)
            v, i = _fetch(v), _fetch(i) + c * CHUNK
            allv = np.concatenate([run_v_s, v], axis=1)
            alli = np.concatenate([run_i_s, i], axis=1)
            sel = np.argsort(-allv, axis=1)[:, :K]
            run_v_s = np.take_along_axis(allv, sel, axis=1)
            run_i_s = np.take_along_axis(alli, sel, axis=1)
            # exact scores at candidates local to this chunk
            local = cand_rows[q0:q0 + step] - c * CHUNK
            in_chunk = (local >= 0) & (local < CHUNK)
            safe = np.where(in_chunk, local, 0).astype(np.int32)
            picked = _fetch(jnp.take_along_axis(
                s, jnp.asarray(safe), axis=1))
            cand_scores[q0:q0 + step] = np.where(
                in_chunk, picked, cand_scores[q0:q0 + step])
            del s
        run_i[q0:q0 + step] = run_i_s
    return run_i, cand_scores


def _fetch(x, timeout=180.0):
    """np.asarray with a wedge watchdog: through the tunneled TPU a
    cold fetch can lose its response and block forever (the engine's
    DeviceCorpus has the same guard). Raises on deadline."""
    deadline = time.monotonic() + timeout
    while hasattr(x, "is_ready") and not x.is_ready():
        if time.monotonic() > deadline:
            raise TimeoutError(f"device fetch wedged (> {timeout:.0f}s)")
        time.sleep(0.05)
    return np.asarray(x)


def _fetch_retry(make, timeout=180.0, attempts=3):
    for a in range(attempts):
        try:
            return _fetch(make(), timeout)
        except TimeoutError:
            print(f"# fetch wedged (attempt {a + 1}); re-dispatching",
                  file=sys.stderr)
    raise TimeoutError("device fetch wedged on every attempt")


def timed_scan(corpus_i8, rinv, queries):
    run = lambda: quant_scan(corpus_i8, rinv, queries, CAND, OVER)
    _fetch_retry(lambda: run()[1])        # compile + settle, wedge-guarded
    t0 = time.perf_counter()
    for _ in range(ROUNDS - 1):
        run()
    out = run()
    i_np = _fetch(out[1])
    dt = time.perf_counter() - t0
    return ROUNDS * queries.shape[0] / dt, i_np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=10_000_000)
    ap.add_argument("--skip-host-leg", action="store_true")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (smoke runs)")
    args = ap.parse_args()
    global CHUNK
    # tiny smoke runs (--rows below one chunk) shrink the chunk so the
    # two-pass device generation still covers the whole corpus
    CHUNK = min(CHUNK, args.rows)
    n = (args.rows // CHUNK) * CHUNK

    t0 = time.perf_counter()
    corpus_i8, rinv, mu, keys = build_corpus(n, jax.random.PRNGKey(0))
    print(f"# corpus {n}x{D} int8 built on device in "
          f"{time.perf_counter()-t0:.1f}s "
          f"({n*D/2**30:.2f} GiB HBM)", file=sys.stderr)

    host_mirror = None
    if not args.skip_host_leg:
        t0 = time.perf_counter()
        # layout-faithful host mirror for gather/BLAS timing (values
        # irrelevant to cost; a real deployment owns the true mirror)
        host_mirror = np.empty((n, D), np.float32)
        block = np.random.default_rng(1).standard_normal(
            (CHUNK, D)).astype(np.float32)
        for c in range(n // CHUNK):
            host_mirror[c * CHUNK:(c + 1) * CHUNK] = block
        print(f"# host mirror filled in {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)

    for B in (64, 512):
        queries = normalize_rows(jax.random.normal(
            jax.random.PRNGKey(100 + B), (B, D), jnp.float32))
        queries.block_until_ready()

        dev_qps, cand_rows = timed_scan(corpus_i8, rinv, queries)
        emit(f"10M-scale int8 scan device leg @ {n}x{D} batch {B}",
             dev_qps, "queries/sec", dev_qps / 100.0)

        host_ms = None
        if host_mirror is not None:
            qh = np.asarray(queries)

            def host_rerank():
                g = host_mirror[cand_rows.reshape(-1)].reshape(B, CAND, D)
                exact = np.matmul(g, qh[:, :, None])[:, :, 0]
                sel = np.argsort(-exact, axis=1)[:, :K]
                return np.take_along_axis(cand_rows, sel, axis=1)

            host_rerank()
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(5):
                    host_rerank()
                best = min(best, (time.perf_counter() - t0) / 5)
            host_ms = best * 1e3
            host_qps = B / best
            emit(f"10M-scale host exact re-rank leg batch {B}",
                 host_qps, "queries/sec")
            sustained = min(dev_qps, host_qps)
            emit(f"10M-scale sustained (min of legs) @ {n}x{D} batch {B}",
                 sustained, "queries/sec", sustained / 100.0)

        # recall of the full serving scheme vs the fp32-exact oracle,
        # all chunk-wise on device
        oracle_ids, cand_exact = exact_oracle_and_candidate_scores(
            keys, queries, cand_rows.astype(np.int64))
        sel = np.argsort(-cand_exact, axis=1)[:, :K]
        served_ids = np.take_along_axis(cand_rows.astype(np.int64), sel,
                                        axis=1)
        recall = float(np.mean([
            len(set(oracle_ids[r]) & set(served_ids[r])) / K
            for r in range(B)]))
        membership = float(np.mean([
            len(set(oracle_ids[r]) & set(cand_rows[r].tolist())) / K
            for r in range(B)]))
        emit(f"10M-scale recall@10 vs fp32-exact oracle batch {B} "
             f"(candidate membership {membership:.4f})", recall, "recall")


if __name__ == "__main__":
    main()
