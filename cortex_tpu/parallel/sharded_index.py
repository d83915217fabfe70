"""ShardedFlatIndex — the multi-chip serving index.

Same `VectorIndex` surface as TpuFlatIndex, but the corpus lives
sharded along the row axis over a `jax.sharding.Mesh`
(NamedSharding(P("shard", None))). Search runs as ONE jitted
shard_map: per-shard bias construction (liveness / kind / agent /
exclusion masks on local rows) + local matmul + local top-k, then an
all_gather of the k candidates per shard over ICI and a final exact
merge — top-k is associative, so the merged result equals the
single-device answer bit-for-bit.

Host bookkeeping (id<->row maps, dirty tracking, interners) is
inherited from DeviceCorpus; only the device layout and the search
dispatch differ. Sync re-uploads the full arrays on change: shards are
compacted wholesale rather than scatter-updated (cross-shard scatter
would reshard anyway), which matches the reference's stale-index +
rebuild model at the multi-chip scale.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.similarity import NEG_INF
from ..vector.index import TpuFlatIndex, VectorFilter
from ..vector.shard import (DeviceCorpus, MAX_EXCLUDE, MAX_FILTER_KINDS,
                            NO_FILTER, _norm_rows)
from .sharding import (SHARD_AXIS, batch_spec, build_mesh, pad_batch,
                       replica_count, result_spec, shard_count, unpad_rows)


@functools.partial(jax.jit, static_argnames=("k", "mesh"))
def _sharded_filtered_topk(mesh: Mesh, corpus, live, kind_code, agent_code,
                           ak, aa, ex_rows, queries, *, k: int
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One dispatch: per-shard mask + matmul + top-k, ICI merge. On a
    2D (replica, shard) mesh the query batch additionally shards along
    the replica axis — each replica group runs this same program on
    its batch slice against its full corpus copy."""
    shard_rows = corpus.shape[0] // shard_count(mesh)

    def local(c_blk, live_blk, kc_blk, ac_blk, ak_r, aa_r, ex_r, q):
        offset = jax.lax.axis_index(SHARD_AXIS) * shard_rows
        bias = jnp.where(live_blk, 0.0, NEG_INF)
        kind_on = ak_r[0] != NO_FILTER
        kind_ok = jnp.any(kc_blk[:, None] == ak_r[None, :], axis=1)
        bias = bias + jnp.where(kind_on & ~kind_ok, NEG_INF, 0.0)
        agent_on = aa_r != NO_FILTER
        bias = bias + jnp.where(agent_on & (ac_blk != aa_r), NEG_INF, 0.0)
        rows = offset + jax.lax.broadcasted_iota(
            jnp.int32, (shard_rows, 1), 0)[:, 0]
        excluded = jnp.any(rows[:, None] == ex_r[None, :], axis=1)
        bias = bias + jnp.where(excluded, NEG_INF, 0.0)

        scores = jnp.dot(q, c_blk.T,
                         preferred_element_type=jnp.float32) + bias[None, :]
        kk = min(k, shard_rows)
        v, i = jax.lax.top_k(scores, kk)
        gi = i + offset
        av = jax.lax.all_gather(v, SHARD_AXIS, axis=1, tiled=True)
        ai = jax.lax.all_gather(gi, SHARD_AXIS, axis=1, tiled=True)
        gv, sel = jax.lax.top_k(av, min(k, av.shape[1]))
        return gv, jnp.take_along_axis(ai, sel, axis=1)

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(SHARD_AXIS, None), P(SHARD_AXIS), P(SHARD_AXIS),
                  P(SHARD_AXIS), P(None), P(), P(None), batch_spec(mesh)),
        out_specs=(result_spec(mesh), result_spec(mesh)),
        check_vma=False)
    return fn(corpus, live, kind_code, agent_code, ak, aa, ex_rows,
              queries)


@functools.partial(jax.jit, static_argnames=("cand", "mesh", "over"))
def _sharded_quant_topk(mesh: Mesh, corpus_i8, rinv, live, kind_code,
                        agent_code, ak, aa, ex_rows, queries, *,
                        cand: int, over: int = 256
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """The int8 serving scan, sharded: per-shard mask + int8 matmul +
    descale + approx top-cand, then an ICI all_gather of each shard's
    candidates and an exact merge to the global top-cand. The caller
    re-ranks the merged candidates exactly against the fp32 host
    mirror (DeviceCorpus._finish_topk rescore leg) — final scores are
    fp32-true exactly as on one chip, so sharding changes throughput,
    never results."""
    shard_rows = corpus_i8.shape[0] // shard_count(mesh)

    def local(c_blk, ri_blk, live_blk, kc_blk, ac_blk, ak_r, aa_r,
              ex_r, q):
        offset = jax.lax.axis_index(SHARD_AXIS) * shard_rows
        bias = jnp.where(live_blk, 0.0, NEG_INF)
        kind_on = ak_r[0] != NO_FILTER
        kind_ok = jnp.any(kc_blk[:, None] == ak_r[None, :], axis=1)
        bias = bias + jnp.where(kind_on & ~kind_ok, NEG_INF, 0.0)
        agent_on = aa_r != NO_FILTER
        bias = bias + jnp.where(agent_on & (ac_blk != aa_r), NEG_INF, 0.0)
        rows = offset + jax.lax.broadcasted_iota(
            jnp.int32, (shard_rows, 1), 0)[:, 0]
        excluded = jnp.any(rows[:, None] == ex_r[None, :], axis=1)
        bias = bias + jnp.where(excluded, NEG_INF, 0.0)

        qs = 127.0 / jnp.maximum(jnp.max(jnp.abs(q), axis=1), 1e-12)
        qi8 = jnp.clip(jnp.round(q * qs[:, None]), -127, 127
                       ).astype(jnp.int8)
        s32 = jax.lax.dot_general(qi8, c_blk, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        s = (s32.astype(jnp.float32) * (ri_blk[None, :] / qs[:, None])
             + bias[None, :])
        ov = min(max(over, cand), shard_rows)
        v, i = jax.lax.approx_max_k(s, ov, recall_target=0.95,
                                    aggregate_to_topk=False)
        kk = min(cand, v.shape[1])
        v2, sel = jax.lax.top_k(v, kk)
        i2 = jnp.take_along_axis(i, sel, axis=1) + offset
        av = jax.lax.all_gather(v2, SHARD_AXIS, axis=1, tiled=True)
        ai = jax.lax.all_gather(i2, SHARD_AXIS, axis=1, tiled=True)
        gv, gsel = jax.lax.top_k(av, min(cand, av.shape[1]))
        return gv, jnp.take_along_axis(ai, gsel, axis=1)

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(SHARD_AXIS, None), P(SHARD_AXIS), P(SHARD_AXIS),
                  P(SHARD_AXIS), P(SHARD_AXIS), P(None), P(), P(None),
                  batch_spec(mesh)),
        out_specs=(result_spec(mesh), result_spec(mesh)),
        check_vma=False)
    return fn(corpus_i8, rinv, live, kind_code, agent_code, ak, aa,
              ex_rows, queries)


@functools.partial(jax.jit, static_argnames=("cand", "mesh", "over"))
def _sharded_quant_hostbias_topk(mesh: Mesh, corpus_i8, rinv, bias,
                                 queries, *, cand: int, over: int = 256
                                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Overflow-filter variant of the sharded int8 scan (exact host
    bias, sharded along rows)."""
    shard_rows = corpus_i8.shape[0] // shard_count(mesh)

    def local(c_blk, ri_blk, b_blk, q):
        offset = jax.lax.axis_index(SHARD_AXIS) * shard_rows
        qs = 127.0 / jnp.maximum(jnp.max(jnp.abs(q), axis=1), 1e-12)
        qi8 = jnp.clip(jnp.round(q * qs[:, None]), -127, 127
                       ).astype(jnp.int8)
        s32 = jax.lax.dot_general(qi8, c_blk, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        s = (s32.astype(jnp.float32) * (ri_blk[None, :] / qs[:, None])
             + b_blk[None, :])
        ov = min(max(over, cand), shard_rows)
        v, i = jax.lax.approx_max_k(s, ov, recall_target=0.95,
                                    aggregate_to_topk=False)
        kk = min(cand, v.shape[1])
        v2, sel = jax.lax.top_k(v, kk)
        i2 = jnp.take_along_axis(i, sel, axis=1) + offset
        av = jax.lax.all_gather(v2, SHARD_AXIS, axis=1, tiled=True)
        ai = jax.lax.all_gather(i2, SHARD_AXIS, axis=1, tiled=True)
        gv, gsel = jax.lax.top_k(av, min(cand, av.shape[1]))
        return gv, jnp.take_along_axis(ai, gsel, axis=1)

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(SHARD_AXIS, None), P(SHARD_AXIS), P(SHARD_AXIS),
                  batch_spec(mesh)),
        out_specs=(result_spec(mesh), result_spec(mesh)),
        check_vma=False)
    return fn(corpus_i8, rinv, bias, queries)


@functools.partial(jax.jit, static_argnames=("k", "mesh"))
def _sharded_hostbias_topk(mesh: Mesh, corpus, bias, queries, *, k: int
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Overflow-filter variant: the exact [N] bias is computed on the
    host (see DeviceCorpus._host_bias) and sharded along the row axis —
    no fixed-shape truncation at any filter-list size."""
    shard_rows = corpus.shape[0] // shard_count(mesh)

    def local(c_blk, b_blk, q):
        offset = jax.lax.axis_index(SHARD_AXIS) * shard_rows
        scores = jnp.dot(q, c_blk.T,
                         preferred_element_type=jnp.float32) + b_blk[None, :]
        kk = min(k, shard_rows)
        v, i = jax.lax.top_k(scores, kk)
        gi = i + offset
        av = jax.lax.all_gather(v, SHARD_AXIS, axis=1, tiled=True)
        ai = jax.lax.all_gather(gi, SHARD_AXIS, axis=1, tiled=True)
        gv, sel = jax.lax.top_k(av, min(k, av.shape[1]))
        return gv, jnp.take_along_axis(ai, sel, axis=1)

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(SHARD_AXIS, None), P(SHARD_AXIS), batch_spec(mesh)),
        out_specs=(result_spec(mesh), result_spec(mesh)),
        check_vma=False)
    return fn(corpus, bias, queries)


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _scatter_quant(i8, ri, rows, q, rinv):
    return i8.at[rows].set(q), ri.at[rows].set(rinv)


class ShardedCorpus(DeviceCorpus):
    """DeviceCorpus with mesh-sharded device arrays + merged search."""

    def __init__(self, dim: int, mesh: Optional[Mesh] = None,
                 storage_dtype: str = "float32",
                 search_path: str = "auto"):
        # "approx" has no sharded kernel; it resolves to exact here
        super().__init__(dim, search_path=search_path,
                         storage_dtype=storage_dtype)
        self.mesh = mesh or build_mesh()
        self._n_shard = shard_count(self.mesh)
        self._n_replica = replica_count(self.mesh)
        from ..vector.shard import MIN_CAP
        if MIN_CAP % self._n_shard != 0:
            from ..errors import IndexError_
            raise IndexError_(
                f"mesh shard count {self._n_shard} must divide the "
                f"capacity ladder (powers of two from {MIN_CAP}); use a "
                f"power-of-two submesh, e.g. build_mesh("
                f"{1 << (self._n_shard.bit_length() - 1)})")

    def _row_alignment(self) -> int:
        # 1.25x gentle-growth steps strip the power-of-two factor; the
        # even NamedSharding needs cap % n_shard == 0 at every rung
        return max(8, self._n_shard)

    def _grow(self, need: int) -> None:
        super()._grow(need)
        assert self._cap % self._n_shard == 0

    def _pad_batch(self, q):
        """Replica-axis batch padding (see sharding.pad_batch)."""
        return pad_batch(self.mesh, q)

    _unpad_batch = staticmethod(unpad_rows)

    def _sync_quant_sharded(self, rows: Optional[np.ndarray]) -> None:
        """int8 shadow maintenance, sharded along rows (centered like
        the single-device corpus; see DeviceCorpus._sync_quant)."""
        from ..ops.similarity import quantize_rows_centered
        if rows is None:
            live = self._live_h
            mu = (self._emb_h[live].mean(axis=0).astype(np.float32)
                  if live.any() else np.zeros(self.dim, np.float32))
            q, rinv, self._quant_mu = quantize_rows_centered(
                self._emb_h, mu)
            shard = NamedSharding(self.mesh, P(SHARD_AXIS, None))
            row = NamedSharding(self.mesh, P(SHARD_AXIS))
            self._dev_q = (jax.device_put(jnp.asarray(q), shard),
                           jax.device_put(jnp.asarray(rinv), row))
        else:
            q, rinv, _ = quantize_rows_centered(
                self._emb_h[rows], self._quant_mu)
            i8, ri = self._dev_q
            # jit scatter keeps the GSPMD layout, like the emb scatter
            self._dev_q = _scatter_quant(i8, ri, jnp.asarray(rows),
                                         jnp.asarray(q),
                                         jnp.asarray(rinv))

    def sync(self) -> None:
        from ..vector.shard import _scatter_update
        with self._lock:
            if self._cap == 0:
                return
            quant = self._quant_enabled()
            if (self._dev is None or self._full_resync
                    or (quant and self._dev_q is None)
                    or len(self._dirty) > max(4096, self._cap // 8)):
                shard = NamedSharding(self.mesh, P(SHARD_AXIS, None))
                row = NamedSharding(self.mesh, P(SHARD_AXIS))
                self._dev = (
                    jax.device_put(jnp.asarray(self._emb_for_device()),
                                   shard),
                    jax.device_put(jnp.asarray(self._live_h), row),
                    jax.device_put(jnp.asarray(self._kind_h), row),
                    jax.device_put(jnp.asarray(self._agent_h), row),
                )
                if quant:
                    self._sync_quant_sharded(None)
                self._full_resync = False
                self._dirty.clear()
            elif self._dirty:
                # small diffs: jit scatter on the sharded arrays (GSPMD
                # keeps the output layout) instead of re-uploading the
                # whole corpus per write->search cycle
                from ..vector.shard import _bucket_rows
                rows = _bucket_rows(np.fromiter(self._dirty, np.int32))
                self._dev = _scatter_update(
                    *self._dev, jnp.asarray(rows),
                    jnp.asarray(self._emb_for_device(rows)),
                    jnp.asarray(self._live_h[rows]),
                    jnp.asarray(self._kind_h[rows]),
                    jnp.asarray(self._agent_h[rows]))
                if quant:
                    self._sync_quant_sharded(rows)
                self._dirty.clear()

    def _choose_path(self, k_bucket: int, emb_resident=None) -> str:
        path = super()._choose_path(k_bucket, emb_resident=emb_resident)
        # no sharded approx kernel; exact merge already near its cost
        return "xla" if path == "approx" else path

    def _dispatch_search(self, q, ak, aa, ex, k_bucket: int,
                         host_bias=None, dev=None, dev_q=None):
        """Override the single-device dispatch with the shard_map
        kernels (per-shard mask+scan+top-k, ICI exact merge). The
        base class's topk/topk_async flow — locking, k-bucketing,
        generation-checked row->id mapping, exact fp32 re-rank of
        quant candidates — is shared, including the dispatch-outside-
        the-lock protocol (dev/dev_q are lock-captured snapshots)."""
        dev = self._dev if dev is None else dev
        dev_q = self._dev_q if dev_q is None else dev_q
        path = self._choose_path(k_bucket,
                                 emb_resident=dev[0] is not None)
        q, b_orig = self._pad_batch(q)
        if path == "quant":
            cand = self._cand_count(k_bucket)
            over = max(512, 2 * cand)
            if host_bias is not None:
                bias = jax.device_put(
                    jnp.asarray(host_bias),
                    NamedSharding(self.mesh, P(SHARD_AXIS)))
                v, i = _sharded_quant_hostbias_topk(
                    self.mesh, dev_q[0], dev_q[1], bias, q,
                    cand=cand, over=over)
            else:
                v, i = _sharded_quant_topk(
                    self.mesh, dev_q[0], dev_q[1],
                    dev[1], dev[2], dev[3], ak, aa,
                    ex, q, cand=cand, over=over)
            v, i = self._unpad_batch(v, i, b_orig)
            return v, i, True
        if host_bias is not None:      # overflow filters: exact host bias
            bias = jax.device_put(
                jnp.asarray(host_bias),
                NamedSharding(self.mesh, P(SHARD_AXIS)))
            v, i = _sharded_hostbias_topk(self.mesh, dev[0], bias,
                                          q, k=k_bucket)
            v, i = self._unpad_batch(v, i, b_orig)
            return v, i, False
        v, i = _sharded_filtered_topk(
            self.mesh, dev[0], dev[1], dev[2],
            dev[3], ak, aa, ex, q, k=k_bucket)
        v, i = self._unpad_batch(v, i, b_orig)
        return v, i, False


class ShardedFlatIndex(TpuFlatIndex):
    """Drop-in VectorIndex whose corpus spans the mesh. With a 1-device
    mesh this degenerates to (unfused) single-chip search — the layer
    exists at mesh size 1, per SURVEY §2.4."""

    def __init__(self, dim: int, mesh: Optional[Mesh] = None,
                 storage_dtype: str = "float32",
                 search_path: str = "auto"):
        self.dim = dim
        self._corpus = ShardedCorpus(dim, mesh,
                                     storage_dtype=storage_dtype,
                                     search_path=search_path)
        self._delta_ids = set()     # incremental-checkpoint working set

    @property
    def mesh(self) -> Mesh:
        return self._corpus.mesh

    def _fresh_corpus(self) -> ShardedCorpus:
        return ShardedCorpus(self.dim, self._corpus.mesh,
                             storage_dtype=self._storage_dtype_str(),
                             search_path=self._corpus._search_path)
