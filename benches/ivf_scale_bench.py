"""IVF at scale — the sublinear option vs the flat scan (r3).

Measures the fused IVF kernel (cortex_tpu.vector.ivf._ivf_search) at
--rows (default 10M) x 768: train spherical k-means on a device
sample, pack the corpus into the [C, L, d] centered-int8 block layout
(assembled chunk-wise ON DEVICE — a 10 GB host upload would bench the
transport), then:

  * QPS at batch 1 / 8 / 64 (pipelined dispatch, single drain) — the
    IVF bet is SMALL-batch latency, where the flat scan's O(N) per
    dispatch dominates (BASELINE 10M row: 4.7k QPS @ 64, worse at 1).
  * candidate recall@10 vs the fp32-exact oracle, computed chunk-wise
    on device. Two query families, both reported: in-distribution
    (corpus row + noise — realistic: queries correlate with content)
    and iid gaussian (adversarial: near-zero cosine to everything, the
    probe ranking is noise-driven).

Corpus is CLUSTERED (8-member centers, like the mixed-workload bench:
the similarity structure of real corpora — iid rows have none and
under-sell any clustered structure; see the recall table both ways in
BASELINE.md).

Run: python benches/ivf_scale_bench.py [--rows 10000000] [--cpu]
Prints one JSON line per measurement.
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

import functools

import jax
import jax.numpy as jnp

from cortex_tpu.ops.similarity import NEG_INF
from cortex_tpu.vector.ivf import (_assign_top2, _ivf_search,
                                   _ivf_search_pallas, _kmeans_device)
from cortex_tpu.vector.shard import NO_FILTER, PAD_CODE, MAX_EXCLUDE, \
    MAX_FILTER_KINDS

D = 768
K = 10
CHUNK = int(os.environ.get("IVF_CHUNK", 500_000))
ROUNDS = int(os.environ.get("IVF_ROUNDS", 30))


def emit(metric, value, unit, vs=None):
    row = {"metric": metric, "value": round(float(value), 4),
           "unit": unit}
    if vs is not None:
        row["vs_baseline"] = round(float(vs), 2)
    print(json.dumps(row), flush=True)


@functools.partial(jax.jit, static_argnames=("n", "groups", "noise"))
def _gen_chunk(key, n, groups, ck, off, noise=0.35):
    """Clustered unit-norm chunk: global row i = center[i % groups] +
    noise. Centers are drawn ON THE FLY from per-group threefry streams
    (fold_in(ck, g)) — a materialized [groups, D] center table is
    3.8 GB of HBM at 10M rows / 8-member groups, which is exactly the
    headroom the 10 GB block layout needs (r3 OOM). Noise is ALSO
    per-row streamed (fold_in(key, global row)) so any row is exactly
    regenerable BY ID from (key, ck) alone — the multi-hop frontier
    scorer relies on this (an XLA row gather from the int8 layout was
    measured pathological: its compile wedged for 10+ minutes at
    [64, 512] x 1M on this target)."""
    idx = off + jnp.arange(n)
    keys = jax.vmap(lambda g: jax.random.fold_in(ck, g))(idx % groups)
    ctr = jax.vmap(lambda k: jax.random.normal(k, (D,), jnp.float32))(keys)
    nkeys = jax.vmap(lambda i: jax.random.fold_in(key, i))(idx)
    nz = jax.vmap(lambda k: jax.random.normal(k, (D,), jnp.float32))(nkeys)
    v = ctr + noise * nz
    return v / jnp.maximum(jnp.linalg.norm(v, axis=1, keepdims=True),
                           1e-12)


@functools.partial(jax.jit, static_argnames=())
def _center_quant(v, mu):
    c = v - mu[None, :]
    m = jnp.maximum(jnp.max(jnp.abs(c), axis=1), 1e-12)
    q = jnp.clip(jnp.round(c * (127.0 / m)[:, None]), -127, 127
                 ).astype(jnp.int8)
    return q, (m / 127.0).astype(jnp.float32)


@jax.jit
def _assign1(v, cent):
    return jnp.argmax(jnp.dot(v, cent.T,
                              preferred_element_type=jnp.float32), axis=1)


@functools.partial(jax.jit, static_argnames=("k",))
def _exact_chunk_topk(v, q, *, k):
    s = jnp.dot(q, v.T, preferred_element_type=jnp.float32)
    return jax.lax.top_k(s, k)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=10_000_000)
    ap.add_argument("--nlist", type=int, default=0)
    ap.add_argument("--nprobe", type=int, default=0)
    ap.add_argument("--cand", type=int, default=64)
    ap.add_argument("--spill", type=float, default=1.0,
                    help="fraction of post-reserve slack filled with "
                         "spilled boundary-row duplicates (engine "
                         "ivf_spill semantics); 0 = r3 baseline")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--group", type=int, default=8,
                    help="rows per corpus center (the corpus's "
                         "similarity-block size): 8 = the r3 default "
                         "geometry (misses arrive as whole seedless "
                         "groups); larger/noisier spreads true "
                         "neighbors across clusters")
    ap.add_argument("--noise", type=float, default=0.35,
                    help="center noise; larger overlaps clusters")
    ap.add_argument("--graph-degree", type=int, default=0,
                    help="kNN-graph refinement degree (engine "
                         "ivf_graph_degree semantics): build the graph "
                         "from the block layout and report refined "
                         "candidate recall@10 alongside the raw probe "
                         "recall; 0 = off")
    ap.add_argument("--hops", type=int, default=1,
                    help="refinement hops (engine REFINE_HOPS "
                         "semantics): hop h>1 re-expands from the "
                         "best-scored additions of hop h-1, scored "
                         "exactly (fp32) by regenerating the addition "
                         "rows from their threefry streams on device — "
                         "the bench analog of the engine's host-mirror "
                         "scoring")
    args = ap.parse_args()
    n, rows_left = args.rows, args.rows
    c = args.nlist or min(8192, max(2, round(float(np.sqrt(n)))))
    p = args.nprobe or min(c, max(8, c // 16))
    groups = max(1, n // max(1, args.group))

    dev = jax.devices()[0]
    emit("ivf-bench platform", 1 if dev.platform == "tpu" else 0,
         f"platform={dev.platform} rows={n} nlist={c} nprobe={p}")

    key = jax.random.PRNGKey(7)
    # base key for the per-group center streams (no table resident)
    ck, key = jax.random.split(key)

    t0 = time.time()
    # pass 1: k-means on one sampled chunk (sample = first chunk rows)
    sk, key = jax.random.split(key)
    sample = _gen_chunk(sk, min(131072, n), groups, ck, 0, noise=args.noise)
    init = sample[jax.random.choice(
        jax.random.PRNGKey(1), sample.shape[0], (c,),
        replace=sample.shape[0] < c)]
    cent = _kmeans_device(sample, init, c=c, iters=8)
    cent.block_until_ready()
    emit("ivf k-means train (131k sample)", time.time() - t0, "seconds")

    # pass 2: assign all rows chunk-wise; assignments land on host
    # (n * 4 bytes), packing plan computed there. Top-2 + margin when
    # spill packing is on (engine _build_ivf semantics).
    t0 = time.time()
    assign = np.empty(n, np.int32)
    second = np.empty(n, np.int32)
    margin = np.empty(n, np.float32)
    # ONE corpus noise key: per-row noise streams (fold_in(nk, row))
    # make every corpus row regenerable by id — chunk boundaries don't
    # affect content
    nk, key = jax.random.split(key)
    chunk_keys = []
    off = 0
    while rows_left > 0:
        m = min(CHUNK, rows_left)
        gk = nk
        chunk_keys.append((gk, off, m))
        v = _gen_chunk(gk, m, groups, ck, off, noise=args.noise)
        if args.spill > 0:
            a1, a2, v1, v2 = _assign_top2(v, cent)
            assign[off:off + m] = np.asarray(a1)
            second[off:off + m] = np.asarray(a2)
            margin[off:off + m] = np.asarray(v1) - np.asarray(v2)
        else:
            assign[off:off + m] = np.asarray(_assign1(v, cent))
        off += m
        rows_left -= m
    del v                                      # free the last chunk
    emit("ivf assignment pass", time.time() - t0, "seconds")

    # packing plan: first-choice capped, spill to least-filled
    t0 = time.time()
    lcap = max(8, int(np.ceil(n / c * 1.3 / 8)) * 8)
    order = np.argsort(assign, kind="stable")
    fs = assign[order]
    starts = np.searchsorted(fs, np.arange(c))
    rank = (np.arange(n) - starts[fs]).astype(np.int64)
    ok = rank < lcap
    cluster = np.empty(n, np.int32)
    slot = np.empty(n, np.int64)
    cluster[order[ok]] = fs[ok]
    slot[order[ok]] = rank[ok]
    fill = np.bincount(fs[ok], minlength=c).astype(np.int64)
    spilled = order[~ok]
    for j in spilled:                      # k-means imbalance tail only
        ch = int(np.argmin(fill))
        cluster[j] = ch
        slot[j] = fill[ch]
        fill[ch] += 1
    flat_pos = cluster.astype(np.int64) * lcap + slot
    # spill plan: boundary rows (smallest top-2 margin) duplicate into
    # their second-choice cluster's post-reserve slack — the engine's
    # SOAR-style packing (vector/ivf.py _build_ivf)
    spill_pos = np.full(n, -1, np.int64)
    if args.spill > 0 and c > 1:
        room = lcap - fill
        avail = np.floor(np.maximum(0, room - np.maximum(room // 4, 1))
                         * args.spill).astype(np.int64)
        elig = np.where(second != cluster)[0]
        sec = second[elig]
        o = np.lexsort((margin[elig], sec))
        secs = sec[o]
        st2 = np.searchsorted(secs, np.arange(c))
        rank2 = np.arange(len(o)) - st2[secs]
        ok2 = rank2 < avail[secs]
        sel = elig[o[ok2]]
        spill_pos[sel] = (secs[ok2].astype(np.int64) * lcap
                          + fill[secs[ok2]] + rank2[ok2])
    n_spill = int((spill_pos >= 0).sum())
    emit("ivf packing plan", time.time() - t0,
         f"seconds (lcap={lcap} fill={n / (c * lcap):.2f} "
         f"spilled={len(spilled)} spill-dups={n_spill})")

    # pass 3: regenerate chunks, center+quantize, scatter into the
    # device block layout. Scatter buffers are DONATED (the functional
    # form double-buffers a ~10 GB layout at 10M rows — the other half
    # of the r3 OOM) and the final reshape donates too so XLA aliases
    # instead of copying.
    t0 = time.time()
    mu = jnp.mean(sample, axis=0)          # corpus-mean estimate
    del sample, init
    emb_flat = jnp.zeros((c * lcap, D), jnp.int8)
    rinv_flat = jnp.zeros((c * lcap,), jnp.float32)
    srows_flat = jnp.full((c * lcap,), -1, jnp.int32)

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def _scatter(ef, rf, sf, pos, q, ri, rid):
        return (ef.at[pos].set(q), rf.at[pos].set(ri),
                sf.at[pos].set(rid))

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2),
                       static_argnames=("c", "lcap"))
    def _finalize(ef, rf, sf, c, lcap):
        sl = sf.reshape(c, lcap)
        return (ef.reshape(c, lcap, D), rf.reshape(c, lcap), sl,
                jnp.where(sl >= 0, 0, PAD_CODE).astype(jnp.int32))

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def _scatter_spill(ef, rf, sf, idx, pos, q, ri, rid):
        # padded entries carry pos = c*lcap (out of bounds) -> dropped
        return (ef.at[pos].set(q[idx], mode="drop"),
                rf.at[pos].set(ri[idx], mode="drop"),
                sf.at[pos].set(rid[idx], mode="drop"))

    # fixed spill bucket so the spill scatter compiles once
    sp_bucket = 0
    if n_spill:
        per_chunk = [int((spill_pos[off:off + m] >= 0).sum())
                     for _, off, m in chunk_keys]
        sp_bucket = 1 << (max(1, max(per_chunk)) - 1).bit_length()
    for gk, off, m in chunk_keys:
        v = _gen_chunk(gk, m, groups, ck, off, noise=args.noise)
        q, ri = _center_quant(v, mu)
        pos = jnp.asarray(flat_pos[off:off + m])
        rid = jnp.arange(off, off + m, dtype=jnp.int32)
        emb_flat, rinv_flat, srows_flat = _scatter(
            emb_flat, rinv_flat, srows_flat, pos, q, ri, rid)
        if sp_bucket:
            sp = spill_pos[off:off + m]
            sidx = np.where(sp >= 0)[0]
            pad = sp_bucket - len(sidx)
            idx2 = np.concatenate([sidx, np.zeros(pad, np.int64)])
            pos2 = np.concatenate(
                [sp[sidx], np.full(pad, c * lcap, np.int64)])
            emb_flat, rinv_flat, srows_flat = _scatter_spill(
                emb_flat, rinv_flat, srows_flat, jnp.asarray(idx2),
                jnp.asarray(pos2), q, ri, rid)
    del v, q, ri, pos, rid
    emb_i8, rinv_sl, slot_rows, kind_sl = _finalize(
        emb_flat, rinv_flat, srows_flat, c=c, lcap=lcap)
    del emb_flat, rinv_flat, srows_flat
    agent_sl = kind_sl
    emb_i8.block_until_ready()
    emit("ivf block build+upload", time.time() - t0, "seconds")

    ak = np.full(MAX_FILTER_KINDS, PAD_CODE, np.int32)
    ak[0] = NO_FILTER
    aa = np.int32(NO_FILTER)
    ex = np.full(MAX_EXCLUDE, NO_FILTER, np.int32)
    cand = args.cand

    if dev.platform == "tpu":
        # serving path on TPU: the Mosaic gather-score kernel over a
        # [C, 8, L] f32 metadata layout (XLA's block gather relayout-
        # copies the whole 10 GB layout — the r3 OOM — and reads at
        # ~7.5 GB/s; the kernel streams probed blocks at ~400+ GB/s)
        @jax.jit
        def _meta_dev(rinv, srows, kinds, agents):
            z = jnp.zeros_like(rinv)
            return jnp.stack(
                [srows.astype(jnp.float32), kinds.astype(jnp.float32),
                 agents.astype(jnp.float32), rinv, z, z, z, z], axis=1)

        meta = _meta_dev(rinv_sl, slot_rows, kind_sl, agent_sl)
        meta.block_until_ready()

        def searches(qs):
            return _ivf_search_pallas(cent, emb_i8, meta, ak, aa, ex,
                                      qs, p=p, cand=cand,
                                      filtered=False,
                                      dedup=n_spill > 0)
    else:
        def searches(qs):
            return _ivf_search(cent, emb_i8, rinv_sl, slot_rows,
                               kind_sl, agent_sl, ak, aa, ex, qs,
                               p=p, cand=cand, dedup=n_spill > 0)

    # ---- kNN-graph refinement structure (vector/knn_graph.py) --------
    nbrs = None
    if args.graph_degree > 0:
        from cortex_tpu.vector.knn_graph import build_knn_graph
        t0 = time.time()
        cl2 = np.where(spill_pos >= 0, spill_pos // lcap, -1
                       ).astype(np.int32)
        sl2 = np.where(spill_pos >= 0, spill_pos % lcap, -1
                       ).astype(np.int32)
        nbrs = build_knn_graph(
            emb_i8, rinv_sl, slot_rows, np.asarray(mu),
            degree=args.graph_degree, cap=n,
            rows=np.arange(n, dtype=np.int64),
            cluster_of=cluster, slot_of=slot.astype(np.int32),
            cluster_of2=cl2, slot_of2=sl2)
        emit("ivf knn-graph build", time.time() - t0,
             f"seconds (degree {args.graph_degree})")

    # ---- QPS: pipelined dispatch, single drain -----------------------
    rng = np.random.default_rng(0)
    for b in (1, 8, 64):
        qk = jax.random.fold_in(key, 999 + b)
        qs = _gen_chunk(qk, max(b, 2), groups, ck, 0, noise=args.noise)[:b]
        searches(qs)[0].block_until_ready()          # compile
        t0 = time.time()
        outs = [searches(qs) for _ in range(ROUNDS)]
        outs[-1][0].block_until_ready()
        dt = time.time() - t0
        emit(f"ivf search @ {n} rows batch {b}",
             ROUNDS * b / dt, "QPS (device leg)")
        emit(f"ivf search latency batch {b}", dt / ROUNDS * 1000, "ms")

    # ---- recall vs fp32-exact oracle, chunk-wise on device -----------
    for fam, make_q in (
            ("in-distribution",
             lambda: _gen_chunk(jax.random.fold_in(key, 555), 64,
                                groups, ck, 0, noise=args.noise)),
            ("iid-gaussian",
             lambda: jnp.asarray(np.linalg.qr(
                 rng.standard_normal((D, 64)))[0].T.astype(np.float32)))):
        qs = make_q()
        v_ivf, rows_ivf = searches(qs)
        rows_ivf = np.asarray(rows_ivf)
        # dead candidate slots carry sentinel row 0 with score NEG_INF
        # (_chunked_topk): mask them to -1 so neither the raw-recall
        # set nor the expansion frontier credits row 0 spuriously
        rows_ivf = np.where(np.asarray(v_ivf) > -1e29, rows_ivf, -1)
        # oracle: exact top-K over every chunk, merged on host
        best_v = np.full((64, K), -np.inf, np.float32)
        best_i = np.zeros((64, K), np.int64)
        for gk, off, m in chunk_keys:
            v = _gen_chunk(gk, m, groups, ck, off, noise=args.noise)
            cv, ci = _exact_chunk_topk(v, qs, k=K)
            cv = np.asarray(cv)
            ci = np.asarray(ci) + off
            allv = np.concatenate([best_v, cv], axis=1)
            alli = np.concatenate([best_i, ci], axis=1)
            sel = np.argsort(-allv, axis=1, kind="stable")[:, :K]
            best_v = np.take_along_axis(allv, sel, axis=1)
            best_i = np.take_along_axis(alli, sel, axis=1)
        hit = np.mean([
            len(set(rows_ivf[b][rows_ivf[b] >= 0].tolist())
                & set(best_i[b].tolist())) / K
            for b in range(64)])
        emit(f"ivf candidate recall@10 ({fam} queries)", hit,
             f"fraction (cand={cand}, nprobe={p}/{c})")
        if nbrs is not None:
            # refined candidate recall: probe candidates UNION their
            # top-frontier graph neighbors (the engine's
            # _expand_candidates; the exact re-rank preserves the set).
            # hops > 1 re-expand from the best-scored additions of the
            # previous hop (engine REFINE_HOPS): the next frontier is
            # ranked EXACTLY (fp32) by regenerating the addition rows
            # from their threefry streams on device — the bench analog
            # of the engine's host-mirror scoring. (A row gather from
            # the int8 layout was tried first and its XLA compile
            # wedged 10+ minutes at [64, 512] x 1M on this target.)
            noise_f = float(args.noise)

            @jax.jit
            def _score_rows(qs2, rows2, ok2):
                ids = jnp.where(ok2, rows2, 0).reshape(-1)
                gk2 = jax.vmap(
                    lambda g: jax.random.fold_in(ck, g))(ids % groups)
                ctr = jax.vmap(lambda kk: jax.random.normal(
                    kk, (D,), jnp.float32))(gk2)
                rk = jax.vmap(
                    lambda i: jax.random.fold_in(nk, i))(ids)
                nz = jax.vmap(lambda kk: jax.random.normal(
                    kk, (D,), jnp.float32))(rk)
                v = ctr + noise_f * nz
                v = v / jnp.maximum(
                    jnp.linalg.norm(v, axis=1, keepdims=True), 1e-12)
                v = v.reshape(rows2.shape[0], rows2.shape[1], D)
                s = jnp.einsum("bmd,bd->bm", v, qs2)
                return jnp.where(ok2, s, NEG_INF)

            oracle = [set(best_i[b].tolist()) for b in range(64)]
            for e in (16, 32, 64):
                front = rows_ivf[:, :e]
                fv = front >= 0          # engine front_v semantics
                found = [set(rows_ivf[b][rows_ivf[b] >= 0].tolist())
                         for b in range(64)]
                for hop in range(1, max(1, args.hops) + 1):
                    exp = nbrs[np.where(fv, front, 0)
                               ].reshape(rows_ivf.shape[0], e, -1)
                    # an invalid frontier slot must not credit row 0's
                    # neighbor list (the engine masks it the same way)
                    exp = np.where(fv[:, :, None], exp, -1
                                   ).reshape(rows_ivf.shape[0], -1)
                    ok = exp >= 0
                    for b in range(64):
                        found[b] |= set(exp[b][ok[b]].tolist())
                    rh = np.mean([len(found[b] & oracle[b]) / K
                                  for b in range(64)])
                    tag = f", hop {hop}" if args.hops > 1 else ""
                    emit(f"ivf refined recall@10 ({fam}, frontier {e}"
                         f"{tag})", rh,
                         f"fraction (degree {args.graph_degree})")
                    if hop <= max(1, args.hops) - 1:
                        sc = np.asarray(_score_rows(
                            qs, jnp.asarray(np.where(ok, exp, 0)),
                            jnp.asarray(ok)))
                        sel = np.argsort(-sc, axis=1)[:, :e]
                        front = np.take_along_axis(exp, sel, axis=1)
                        fv = (np.take_along_axis(ok, sel, axis=1)
                              & (np.take_along_axis(sc, sel, axis=1)
                                 > -1e29))


if __name__ == "__main__":
    main()
