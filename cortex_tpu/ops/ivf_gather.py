"""Pallas gather-score kernel for the IVF block layout.

Why this exists: the IVF search must read `nprobe` arbitrary cluster
blocks per query out of a [C, L, d] HBM-resident layout. The XLA
gather (`emb_i8[probe]`) is catastrophically mis-lowered on this
target at scale — measured 7.5 GB/s and a full relayout COPY of the
10 GB layout materialized as HLO temps (the r3 10M OOM); the [C, L]
metadata gathers mis-lower the same way (3.3 ms at batch 1, OOM at
batch 64). Mosaic's scalar-prefetch pipeline is the native shape for
this access pattern: the probe list is prefetched to SMEM, each grid
step DMAs exactly one probed cluster block HBM->VMEM (the pipeline
overlaps the next block's DMA with the current block's compute), and
the int8 scores + filter bias come out in one pass.

Filter encoding: the allowed-kind / agent / exclusion lists are
scalar-prefetched (SMEM int32) and compared against the metadata lane
vectors via a statically-unrolled scalar-broadcast chain. Broadcasting
the [L]-lane metadata against a [16]/[64] lane vector instead
(`sr[:, None] == ex[None, :]`) forces a lane->sublane relayout of the
whole metadata row EVERY grid step — measured 145 GB/s vs this form's
~400 GB/s on the same shapes. The unfiltered case (the common serving
path) is a separate static specialization that skips the compare chain
entirely.

Layout contract (see vector/ivf.py, which builds it):
  * emb_i8 [C, L, d] int8 — centered-quantized rows, zero-padded slots.
  * meta [C, 8, L] float32 — per-slot metadata packed on the sublane
    axis so a (1, 8, L) block tiles exactly (a [C, L] f32 array cannot
    be block-gathered by cluster: a (1, L) block violates the (8, 128)
    tiling rule, and padding 1->8 sublanes would 8x the memory).
    Rows: 0 = global row id (-1 empty), 1 = kind code, 2 = agent code,
    3 = rinv dequant scale, 4-7 = zero. Row ids / codes are stored AS
    FLOAT: every value is an integer < 2^24, so the representation is
    exact (enforced at build time by MAX_F32_EXACT_ROWS).

Numerics parity with the XLA path (vector/ivf._ivf_candidates): the
int8 block and int8 query are cast to f32 — exact — and dotted with
fp32 accumulation, so every product and the running sum
(<= 768 * 127^2 < 2^24) is exact: bit-identical to the XLA path's
int8 dot_general with int32 accumulation, before the same rinv
descale. (A bf16 cast would be exact too, but Mosaic's matvec
lowering rejects bf16xbf16->f32 on this toolchain.)

Output packing: scores/rows are [B * p_pad, L] f32 written as (8, L)
blocks revisited for 8 consecutive grid steps (p_pad rounds nprobe up
to a multiple of 8 so a block never spans two queries) — a (1, L)
output block would hit the same tiling rule as above. The probe list
is padded with cluster 0 for the extra steps; the caller masks those
columns to NEG_INF after the reshape.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .similarity import NEG_INF

#: row ids / codes are stored as f32 in the meta layout — exact only
#: below 2^24 (vector/ivf.py falls back to the XLA path past this)
MAX_F32_EXACT_ROWS = 1 << 24

META_ROW, META_KIND, META_AGENT, META_RINV = 0, 1, 2, 3
META_SUBLANES = 8

#: tests flip this to run the kernel in interpreter mode off-TPU
INTERPRET = False


def _kernel(pr_ref, ak_ref, aa_ref, ex_ref, emb_ref, meta_ref, q_ref,
            s_out, r_out, *, filtered: bool):
    import jax.experimental.pallas as pl
    i = pl.program_id(0)
    blk = emb_ref[0].astype(jnp.float32)          # [L, d] (int8 exact)
    qv = q_ref[0, 0].astype(jnp.float32)          # [d]
    m = meta_ref[0]                               # [8, L] f32
    sr, ri = m[META_ROW], m[META_RINV]
    s = jnp.dot(blk, qv, preferred_element_type=jnp.float32) * ri
    ok = sr >= 0.0                                # liveness ([L] lanes)
    if filtered:
        kc, ac = m[META_KIND], m[META_AGENT]
        no_filter = jnp.int32(-1)                 # shard.NO_FILTER
        # scalar-broadcast compare chains: each step is one [L] lane-
        # vector op against an SMEM scalar — no relayout (see module
        # docstring for the measured cost of the 2D broadcast form)
        kind_on = ak_ref[0] != no_filter
        kind_ok = kc == ak_ref[0].astype(jnp.float32)
        for t in range(1, ak_ref.shape[0]):
            kind_ok = kind_ok | (kc == ak_ref[t].astype(jnp.float32))
        ok = ok & (~kind_on | kind_ok)
        agent_on = aa_ref[0] != no_filter
        ok = ok & (~agent_on | (ac == aa_ref[0].astype(jnp.float32)))
        # exclusion pads with NO_FILTER (-1): matches only empty slots,
        # which liveness already masks — same semantics as the XLA path
        excl = sr == ex_ref[0].astype(jnp.float32)
        for t in range(1, ex_ref.shape[0]):
            excl = excl | (sr == ex_ref[t].astype(jnp.float32))
        ok = ok & ~excl
    s = jnp.where(ok, s, jnp.float32(NEG_INF))
    lane = i % META_SUBLANES
    # (8, L) out blocks are revisited for 8 consecutive steps; each
    # step fills one sublane (static-unrolled: Mosaic's dynamic
    # second-minor stores are not a supported lowering everywhere)
    for k in range(META_SUBLANES):
        @pl.when(lane == k)
        def _():
            s_out[k, :] = s
            r_out[k, :] = sr


@functools.partial(jax.jit, static_argnames=("filtered",))
def probed_scores(emb_i8, meta, probe, qi8, ak, aa, ex, *,
                  filtered: bool = True):
    """One fused gather+score+bias pass over the probed blocks.

    probe [B, p] int32 cluster ids; qi8 [B, d] int8 quantized queries;
    ak [16] / aa [1] / ex [64] int32 filter lists (shard.py encoding).
    `filtered=False` compiles the compare chains out — REQUIRES the
    filter arrays to be all-NO_FILTER (callers pass the host-side
    knowledge; the arrays still feed the trace for shape stability).
    Returns (scores [B, p*L] f32 — descaled q_i8.(x-mu) with liveness/
    filter masking applied, pad columns NEG_INF; rows [B, p*L] int32,
    0 where masked). Scores carry NO query descale (1/qs) — a positive
    per-query constant that never changes per-query ranking; callers
    that need calibrated values apply it to the top-k slice.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, p_in = probe.shape
    c, l, d = emb_i8.shape
    p_pad = -(-p_in // META_SUBLANES) * META_SUBLANES
    if p_pad != p_in:
        probe = jnp.pad(probe, ((0, 0), (0, p_pad - p_in)))
    g = b * p_pad

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,              # probe, ak, aa, ex -> SMEM
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, l, d), lambda i, pr, ak, aa, ex:
                         (pr[i], 0, 0)),
            pl.BlockSpec((1, META_SUBLANES, l), lambda i, pr, ak, aa, ex:
                         (pr[i], 0, 0)),
            pl.BlockSpec((1, 1, d), lambda i, pr, ak, aa, ex:
                         (i // p_pad, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((META_SUBLANES, l), lambda i, pr, ak, aa, ex:
                         (i // META_SUBLANES, 0)),
            pl.BlockSpec((META_SUBLANES, l), lambda i, pr, ak, aa, ex:
                         (i // META_SUBLANES, 0)),
        ],
    )
    s, r = pl.pallas_call(
        functools.partial(_kernel, filtered=filtered),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((g, l), jnp.float32),
                   jax.ShapeDtypeStruct((g, l), jnp.float32)],
        interpret=INTERPRET,
    )(probe.reshape(g), ak.astype(jnp.int32).reshape(-1),
      aa.astype(jnp.int32).reshape(-1), ex.astype(jnp.int32).reshape(-1),
      emb_i8, meta, qi8.reshape(b, 1, d))
    s = s.reshape(b, p_pad * l)
    rows = r.reshape(b, p_pad * l).astype(jnp.int32)
    if p_pad != p_in:
        col = jnp.arange(p_pad * l, dtype=jnp.int32)
        live = col < p_in * l
        s = jnp.where(live[None, :], s, jnp.float32(NEG_INF))
        rows = jnp.where(live[None, :], rows, 0)
    return s, rows
