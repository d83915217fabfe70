"""2D (replica, shard) mesh: query-batch data-parallelism composed
with corpus-axis sharding.

The replica axis multiplies serving throughput when the corpus fits a
shard group's HBM with devices to spare; the shard axis buys capacity.
These tests run every serving path (exact, int8+exact-re-rank, host
bias overflow, IVF) on 2x4 and 4x2 layouts of the virtual 8-device CPU
mesh and assert bit-parity with the single-device answer — the 2D
layout may change throughput, never results.
"""

import numpy as np
import pytest

from cortex_tpu.config import ConfigError, CortexConfig
from cortex_tpu.parallel import (ShardedFlatIndex, ShardedIvfIndex,
                                 build_mesh, replica_count, shard_corpus,
                                 shard_count, sharded_engine_step)
from cortex_tpu.vector import TpuFlatIndex, VectorFilter
from cortex_tpu.vector.index import BruteForceIndex

DIM = 32


def seed(idx, n=300, seed=0):
    rng = np.random.default_rng(seed)
    vecs = rng.normal(size=(n, DIM)).astype(np.float32)
    ids = [f"n{i:04d}" for i in range(n)]
    kinds = ["fact" if i % 3 else "event" for i in range(n)]
    agents = [f"a{i % 5}" for i in range(n)]
    idx.insert_batch(ids, vecs, kinds=kinds, agents=agents)
    return ids, vecs


class TestMeshLayout:
    def test_2d_shape_and_counts(self):
        m = build_mesh(8, replicas=2)
        assert m.axis_names == ("replica", "shard")
        assert replica_count(m) == 2 and shard_count(m) == 4

    def test_1d_counts(self):
        m = build_mesh(8)
        assert replica_count(m) == 1 and shard_count(m) == 8

    def test_replicas_must_divide(self):
        with pytest.raises(RuntimeError, match="must divide"):
            build_mesh(8, replicas=3)

    def test_full_replication(self):
        # replicas == devices: every device holds the whole corpus,
        # shard axis degenerates to size 1
        m = build_mesh(8, replicas=8)
        assert replica_count(m) == 8 and shard_count(m) == 1


@pytest.fixture(params=[(2, "2x4"), (4, "4x2")])
def mesh2d(request):
    replicas, _ = request.param
    return build_mesh(8, replicas=replicas)


class TestFlat2DParity:
    def test_exact_path_matches_single_device(self, mesh2d):
        sharded = ShardedFlatIndex(DIM, mesh2d)
        single = TpuFlatIndex(DIM)
        seed(sharded)
        seed(single)
        rng = np.random.default_rng(7)
        # batch sizes around the replica count: 1 and 5 force the
        # replica-axis pad/unpad path, 8 splits evenly
        for b in (1, 5, 8):
            q = rng.normal(size=(b, DIM)).astype(np.float32)
            hs = sharded.search_batch(q, 10)
            h1 = single.search_batch(q, 10)
            for row_s, row_1 in zip(hs, h1):
                assert [i for i, _ in row_s] == [i for i, _ in row_1]
                np.testing.assert_allclose([s for _, s in row_s],
                                           [s for _, s in row_1],
                                           atol=1e-5)

    def test_filters_on_2d(self, mesh2d):
        sharded = ShardedFlatIndex(DIM, mesh2d)
        bf = BruteForceIndex(DIM)
        rng = np.random.default_rng(3)
        n = 200
        vecs = rng.normal(size=(n, DIM)).astype(np.float32)
        ids = [f"n{i:04d}" for i in range(n)]
        kinds = ["fact" if i % 3 else "event" for i in range(n)]
        agents = [f"a{i % 5}" for i in range(n)]
        sharded.insert_batch(ids, vecs, kinds=kinds, agents=agents)
        for i in range(n):
            bf.insert(ids[i], vecs[i], kind=kinds[i],
                      source_agent=agents[i])
        q = rng.normal(size=(3, DIM)).astype(np.float32)
        for flt in (VectorFilter(kinds=["fact"]),
                    VectorFilter(source_agent="a2"),
                    VectorFilter(exclude_ids=ids[::7])):
            got = sharded.search_batch(q, 8, flt)
            want = bf.search_batch(q, 8, flt)
            for g, w in zip(got, want):
                assert [i for i, _ in g] == [i for i, _ in w]

    def test_quant_path_on_2d(self, mesh2d):
        """int8 scan sharded within each replica group + exact host
        re-rank: identical to brute force on an anisotropic corpus."""
        sharded = ShardedFlatIndex(DIM, mesh2d, search_path="quant")
        bf = BruteForceIndex(DIM)
        rng = np.random.default_rng(41)
        n = 400
        common = rng.normal(size=(1, DIM)).astype(np.float32)
        common /= np.linalg.norm(common)
        vecs = common + rng.normal(size=(n, DIM)).astype(np.float32) * 0.05
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        ids = [f"n{i:04d}" for i in range(n)]
        sharded.insert_batch(ids, vecs)
        for i in range(n):
            bf.insert(ids[i], vecs[i])
        q = common + rng.normal(size=(3, DIM)).astype(np.float32) * 0.05
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        got = sharded.search_batch(q, 10)
        want = bf.search_batch(q, 10)
        for g, w in zip(got, want):
            assert [i for i, _ in g] == [i for i, _ in w]
            np.testing.assert_allclose([s for _, s in g],
                                       [s for _, s in w], atol=1e-5)

    def test_hostbias_overflow_on_2d(self, mesh2d):
        """>MAX_EXCLUDE exclusions route through the host-bias kernel;
        excluded ids must never surface on the 2D mesh either."""
        sharded = ShardedFlatIndex(DIM, mesh2d)
        ids, vecs = seed(sharded, n=200)
        exclude = ids[:150]
        hits = sharded.search_batch(vecs[:2], 10,
                                    VectorFilter(exclude_ids=exclude))
        got = {i for row in hits for i, _ in row if i is not None}
        assert not (got & set(exclude))
        assert got    # the 50 non-excluded rows still answer


class TestIvf2D:
    def test_full_probe_matches_bruteforce(self, mesh2d):
        """nprobe == nlist probes every cluster: candidates are exact,
        the re-rank is exact, so the 2D IVF equals brute force."""
        nlist = 8
        idx = ShardedIvfIndex(DIM, mesh2d, nlist=nlist, nprobe=nlist)
        bf = BruteForceIndex(DIM)
        rng = np.random.default_rng(11)
        n = 300
        vecs = rng.normal(size=(n, DIM)).astype(np.float32)
        ids = [f"v{i:04d}" for i in range(n)]
        idx.insert_batch(ids, vecs)
        for i in range(n):
            bf.insert(ids[i], vecs[i])
        for b in (1, 3, 8):
            q = rng.normal(size=(b, DIM)).astype(np.float32)
            got = idx.search_batch(q, 10)
            want = bf.search_batch(q, 10)
            for g, w in zip(got, want):
                assert [i for i, _ in g] == [i for i, _ in w]


class TestEngineStep2D:
    def test_engine_step_matches_1d(self):
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P
        from cortex_tpu.ops.similarity import normalize_rows

        rng = np.random.default_rng(0)
        N, D, B, E = 512, 64, 8, 128
        corpus_h = normalize_rows(
            jnp.asarray(rng.normal(size=(N, D)).astype(np.float32)))
        bias_h = jnp.zeros(N, jnp.float32)
        queries = normalize_rows(
            jnp.asarray(rng.normal(size=(B, D)).astype(np.float32)))
        new_embs = normalize_rows(
            jnp.asarray(rng.normal(size=(B, D)).astype(np.float32)))
        ew_h = rng.uniform(0.1, 1.0, E).astype(np.float32)
        ed_h = rng.uniform(0, 100, E).astype(np.float32)
        ei_h = rng.uniform(0, 1, E).astype(np.float32)

        outs = []
        for replicas in (1, 2, 4):
            mesh = build_mesh(8, replicas=replicas)
            corpus, bias = shard_corpus(mesh, corpus_h, bias_h)
            spec = NamedSharding(mesh, P("shard"))
            ew = jax.device_put(jnp.asarray(ew_h), spec)
            ed = jax.device_put(jnp.asarray(ed_h), spec)
            ei = jax.device_put(jnp.asarray(ei_h), spec)
            out = sharded_engine_step(mesh, corpus, bias, queries,
                                      new_embs, ew, ed, ei, k=4)
            outs.append([np.asarray(o) for o in out])
        for got in outs[1:]:
            for a, b in zip(outs[0], got):
                np.testing.assert_allclose(a, b, atol=1e-5)


class TestPrimitives2D:
    def test_cosine_topk_pads_odd_batches(self):
        """The public primitive must accept any B on a 2D mesh, like
        the index classes do (it zero-pads to a replica multiple)."""
        import jax.numpy as jnp
        from cortex_tpu.ops.similarity import normalize_rows

        rng = np.random.default_rng(5)
        corpus_h = normalize_rows(
            jnp.asarray(rng.normal(size=(64, DIM)).astype(np.float32)))
        bias_h = jnp.zeros(64, jnp.float32)
        q = normalize_rows(
            jnp.asarray(rng.normal(size=(3, DIM)).astype(np.float32)))
        from cortex_tpu.parallel import sharded_cosine_topk
        outs = []
        for replicas in (1, 2):
            mesh = build_mesh(8, replicas=replicas)
            corpus, bias = shard_corpus(mesh, corpus_h, bias_h)
            v, i = sharded_cosine_topk(mesh, corpus, q, bias, 5)
            assert v.shape == (3, 5) and i.shape == (3, 5)
            outs.append((np.asarray(v), np.asarray(i)))
        np.testing.assert_allclose(outs[0][0], outs[1][0], atol=1e-5)
        np.testing.assert_array_equal(outs[0][1], outs[1][1])

    def test_engine_step_pads_odd_edge_counts(self):
        """Edge arrays whose length doesn't divide the device count
        are padded for the elementwise sweep and sliced back."""
        import jax.numpy as jnp
        from cortex_tpu.ops.similarity import normalize_rows

        rng = np.random.default_rng(9)
        corpus_h = normalize_rows(
            jnp.asarray(rng.normal(size=(64, DIM)).astype(np.float32)))
        bias_h = jnp.zeros(64, jnp.float32)
        q = normalize_rows(
            jnp.asarray(rng.normal(size=(3, DIM)).astype(np.float32)))
        E = 101                       # not divisible by 8
        ew = jnp.asarray(rng.uniform(0.1, 1.0, E).astype(np.float32))
        ed = jnp.asarray(rng.uniform(0, 100, E).astype(np.float32))
        ei = jnp.asarray(rng.uniform(0, 1, E).astype(np.float32))
        mesh = build_mesh(8, replicas=2)
        corpus, bias = shard_corpus(mesh, corpus_h, bias_h)
        out = sharded_engine_step(mesh, corpus, bias, q, q, ew, ed, ei,
                                  k=4)
        new_w, delete_mask = out[5], out[6]
        assert new_w.shape == (E,) and delete_mask.shape == (E,)
        eff = 0.01 * (1.0 - np.asarray(ei) * 0.8)
        want = np.asarray(ew) * np.exp(-eff * np.asarray(ed))
        np.testing.assert_allclose(np.asarray(new_w), want, atol=1e-6)


class TestConfig2D:
    def test_mesh_replicas_validation(self):
        cfg = CortexConfig()
        cfg.embedding.mesh_replicas = 3
        with pytest.raises(ConfigError, match="power of two"):
            cfg.validate()
        cfg.embedding.mesh_replicas = 0
        with pytest.raises(ConfigError):
            cfg.validate()
        cfg.embedding.mesh_replicas = 4
        cfg.validate()

    def test_api_builds_2d_mesh(self):
        from cortex_tpu.api import Cortex
        cfg = CortexConfig()
        cfg.embedding.sharded = True
        cfg.embedding.mesh_replicas = 2
        cx = Cortex.in_memory(cfg)
        try:
            assert isinstance(cx.index, ShardedFlatIndex)
            assert replica_count(cx.index.mesh) == 2
            assert shard_count(cx.index.mesh) == 4
            cx.store(Cortex.fact(
                "replica mesh title check: corpus replicates across "
                "groups and queries shard across them"))
            hits = cx.search("replica mesh", record_access=False)
            assert hits and hits[0][1].title.startswith(
                "replica mesh title check")
        finally:
            cx.close()

    def test_api_rejects_too_many_replicas(self):
        from cortex_tpu.api import Cortex
        cfg = CortexConfig()
        cfg.embedding.sharded = True
        cfg.embedding.mesh_replicas = 16   # > 8 devices
        with pytest.raises(ConfigError, match="mesh_replicas"):
            Cortex.in_memory(cfg)

    def test_api_rejects_non_power_of_two_replicas(self):
        """Programmatic configs can skip validate(); _make_index must
        still raise ConfigError, not build_mesh's raw RuntimeError."""
        from cortex_tpu.api import Cortex
        cfg = CortexConfig()
        cfg.embedding.sharded = True
        cfg.embedding.mesh_replicas = 3
        with pytest.raises(ConfigError, match="power of two"):
            Cortex.in_memory(cfg)
