"""Corpus-axis parallelism over a jax.sharding.Mesh.

The ICI/DCN layer of the rebuild (SURVEY §2.4 / §5): the reference is
single-machine by design, so the capability-equivalent here is sharding
the [N, d] embedding corpus across chips along the corpus axis:

  - corpus rows + liveness bias: NamedSharding along "shard"
  - query batch: replicated
  - per-shard fused cosine + local top-k (MXU matmul per device)
  - cross-shard merge: all_gather the k local candidates per shard over
    ICI, then a final top-k over [B, n_dev * k] — the flash-style online
    merge applied across devices instead of N-blocks
  - decay sweeps shard the edge arrays the same way (pure elementwise,
    no collectives needed)

Single-chip is a 1-device mesh — the layer exists even at mesh size 1.
Multi-host scale-out keeps this exact program: only the Mesh's device
list changes (DCN between hosts, ICI within).

2D composition (replica x shard): when the corpus fits each shard
group's HBM with devices to spare, the spare dimension becomes a
QUERY-batch data-parallel axis — the corpus replicates across
"replica", the query batch shards along it, and each replica group
serves its batch slice independently (zero collectives on the replica
axis; the shard-axis all_gather merge stays within each group). This
is the scaling-book recipe applied to the corpus engine: shard for
capacity, replicate for throughput, pick (n_replica, n_shard) from
corpus bytes vs per-device HBM. build_mesh(n, replicas=r) lays the
same devices out as an (r, n//r) mesh; every kernel in this package
reads its specs off the mesh's axis names, so 1D and 2D meshes run
the same programs.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.similarity import NEG_INF

SHARD_AXIS = "shard"
REPLICA_AXIS = "replica"


def build_mesh(n_devices: Optional[int] = None,
               replicas: int = 1) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            # Fail loudly: silently shrinking to fewer devices would let a
            # "multi-chip" run degenerate to single-chip without anyone
            # noticing (VERDICT r1 weak #7).
            raise RuntimeError(
                f"build_mesh({n_devices}) requested but only {len(devs)} "
                f"JAX device(s) are visible on platform "
                f"'{devs[0].platform}'. For a virtual CPU mesh set "
                f"XLA_FLAGS=--xla_force_host_platform_device_count="
                f"{n_devices} and JAX_PLATFORMS=cpu before JAX initializes.")
        devs = devs[:n_devices]
    if replicas <= 1:
        return Mesh(np.array(devs), (SHARD_AXIS,))
    if len(devs) % replicas != 0:
        raise RuntimeError(
            f"build_mesh(replicas={replicas}) must divide the device "
            f"count {len(devs)} — the (replica, shard) layout needs "
            f"equal shard groups")
    return Mesh(np.array(devs).reshape(replicas, -1),
                (REPLICA_AXIS, SHARD_AXIS))


def shard_count(mesh: Mesh) -> int:
    """Devices along the corpus (shard) axis."""
    if SHARD_AXIS in mesh.axis_names:
        return int(mesh.shape[SHARD_AXIS])
    return int(mesh.devices.size)


def replica_count(mesh: Mesh) -> int:
    """Devices along the query-batch (replica) axis (1 on a 1D mesh)."""
    if REPLICA_AXIS in mesh.axis_names:
        return int(mesh.shape[REPLICA_AXIS])
    return 1


def batch_spec(mesh: Mesh) -> P:
    """PartitionSpec for a [B, ...] query batch on this mesh: sharded
    along the replica axis when one exists, replicated otherwise."""
    if REPLICA_AXIS in mesh.axis_names:
        return P(REPLICA_AXIS, None)
    return P(None, None)


def result_spec(mesh: Mesh) -> P:
    """PartitionSpec for per-query [B, k] results (mirrors batch_spec:
    each replica group owns its batch slice's rows)."""
    if REPLICA_AXIS in mesh.axis_names:
        return P(REPLICA_AXIS, None)
    return P()


def elementwise_spec(mesh: Mesh) -> P:
    """PartitionSpec for a [E] array swept elementwise with no
    collectives (decay, retention): flatten over EVERY mesh axis so
    all devices share the work, replica axis included."""
    if REPLICA_AXIS in mesh.axis_names:
        return P((REPLICA_AXIS, SHARD_AXIS))
    return P(SHARD_AXIS)


def _pad_to_multiple(x: jnp.ndarray, m: int, axis: int = 0,
                     value: float = 0.0) -> jnp.ndarray:
    n = x.shape[axis]
    pad = (-n) % m
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def pad_batch(mesh: Mesh, q: jnp.ndarray) -> Tuple[jnp.ndarray, int]:
    """Pad a [B, ...] query batch to a replica-axis multiple (the batch
    shards along "replica" on a 2D mesh — shard_map needs an even
    split; a 1D mesh is a no-op). Returns (q_padded, original_rows);
    slice per-query results back with unpad_rows."""
    b = q.shape[0]
    pad = (-b) % replica_count(mesh)
    if pad:
        q = jnp.concatenate(
            [q, jnp.zeros((pad,) + q.shape[1:], q.dtype)])
    return q, b


def unpad_rows(v: jnp.ndarray, i: jnp.ndarray, b_orig: int
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop the rows pad_batch added from a ([B, k], [B, k]) result."""
    if v.shape[0] != b_orig:
        v, i = v[:b_orig], i[:b_orig]
    return v, i


def shard_corpus(mesh: Mesh, corpus: jnp.ndarray,
                 bias: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Lay out corpus rows and their bias across the mesh's shard axis
    (replicated along the replica axis on a 2D mesh)."""
    n_sh = shard_count(mesh)
    corpus = _pad_to_multiple(corpus, n_sh, axis=0)
    bias = _pad_to_multiple(bias, n_sh, axis=0, value=NEG_INF)
    c = jax.device_put(corpus, NamedSharding(mesh, P(SHARD_AXIS, None)))
    b = jax.device_put(bias, NamedSharding(mesh, P(SHARD_AXIS)))
    return c, b


@functools.partial(jax.jit, static_argnames=("k", "mesh"))
def sharded_cosine_topk(mesh: Mesh, corpus: jnp.ndarray, queries: jnp.ndarray,
                        bias: jnp.ndarray, k: int
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact global top-k over a corpus sharded along axis 0.

    corpus [N, d] sharded P("shard", None); bias [N] sharded P("shard");
    queries [B, d] replicated (or sharded along "replica" on a 2D mesh
    — batches whose B is not a multiple of the replica count are
    zero-padded internally and the pad rows sliced back off). Returns
    ([B, k], [B, k]) with global row indices.
    """
    queries, b_orig = pad_batch(mesh, queries)
    shard_rows = corpus.shape[0] // shard_count(mesh)

    def local(corpus_blk, bias_blk, q):
        scores = jnp.dot(q, corpus_blk.T,
                         preferred_element_type=jnp.float32) + bias_blk[None, :]
        kk = min(k, shard_rows)
        v, i = jax.lax.top_k(scores, kk)                       # local rows
        gi = i + jax.lax.axis_index(SHARD_AXIS) * shard_rows   # global rows
        # ICI merge: gather each shard's candidates, re-top-k
        av = jax.lax.all_gather(v, SHARD_AXIS, axis=1, tiled=True)
        ai = jax.lax.all_gather(gi, SHARD_AXIS, axis=1, tiled=True)
        gv, sel = jax.lax.top_k(av, min(k, av.shape[1]))
        gidx = jnp.take_along_axis(ai, sel, axis=1)
        return gv, gidx

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(SHARD_AXIS, None), P(SHARD_AXIS), batch_spec(mesh)),
        out_specs=(result_spec(mesh), result_spec(mesh)),
        check_vma=False)
    v, i = fn(corpus, bias, queries)
    return unpad_rows(v, i, b_orig)


@functools.partial(jax.jit, static_argnames=("k", "threshold", "mesh"))
def sharded_engine_step(mesh: Mesh, corpus: jnp.ndarray, bias: jnp.ndarray,
                        queries: jnp.ndarray, new_embs: jnp.ndarray,
                        edge_weights: jnp.ndarray, edge_days: jnp.ndarray,
                        edge_imp: jnp.ndarray, k: int = 10,
                        threshold: float = 0.75):
    """The full multi-chip engine step: batched query search + auto-link
    candidate scan (new x corpus) + decay sweep, all sharded. This is the
    jit target dryrun_multichip exercises (the framework's 'training
    step' equivalent — one cycle of the always-on engine loop).
    """
    # 1. query search with cross-shard merge
    qv, qi = sharded_cosine_topk(mesh, corpus, queries, bias, k)

    # 2. auto-link candidate scan: new nodes vs full corpus, top-k + mask
    lv, li = sharded_cosine_topk(mesh, corpus, new_embs, bias, k)
    link_mask = lv >= threshold

    # 3. decay sweep over edges sharded along the edge axis
    def decay_local(w, days, imp):
        eff = 0.01 * (1.0 - imp * 0.8)
        neww = w * jnp.exp(-eff * jnp.maximum(days, 0.0))
        return neww, neww < 0.05

    esp = elementwise_spec(mesh)
    n_dev = int(mesh.devices.size)
    e_orig = edge_weights.shape[0]
    ew = _pad_to_multiple(edge_weights, n_dev)
    ed = _pad_to_multiple(edge_days, n_dev)
    ei = _pad_to_multiple(edge_imp, n_dev, value=1.0)
    dec = jax.shard_map(
        decay_local, mesh=mesh,
        in_specs=(esp, esp, esp),
        out_specs=(esp, esp),
        check_vma=False)
    new_w, delete_mask = dec(ew, ed, ei)
    if e_orig != ew.shape[0]:
        new_w, delete_mask = new_w[:e_orig], delete_mask[:e_orig]
    return qv, qi, lv, li, link_mask, new_w, delete_mask
