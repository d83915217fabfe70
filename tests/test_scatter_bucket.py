"""Incremental-scatter shape bucketing (r3 mixed-workload fix).

Every distinct dirty-row count used to compile its own donating
scatter program; a mixed write workload produces arbitrary counts wave
by wave, so serving paid a cold XLA compile (~tens of seconds on a
tunneled device) inside the hot path — measured as multi-minute p99
search stalls in benches/mixed_workload_bench.py. Dirty-row lists now
pad to the next power of two by repeating the first row (idempotent:
duplicate index, identical values), bounding the program count at
~log2(cap)."""

import numpy as np

from cortex_tpu.vector.index import TpuFlatIndex
from cortex_tpu.vector.shard import _bucket_rows, _scatter_update


class TestBucketRows:
    def test_pads_to_next_power_of_two_with_first_row(self):
        rows = np.asarray([7, 3, 9], np.int32)
        out = _bucket_rows(rows)
        assert list(out) == [7, 3, 9, 7]

    def test_exact_power_of_two_untouched(self):
        rows = np.asarray([4, 1, 2, 8], np.int32)
        assert list(_bucket_rows(rows)) == [4, 1, 2, 8]

    def test_single_row(self):
        assert list(_bucket_rows(np.asarray([5], np.int32))) == [5]


class TestScatterProgramReuse:
    def test_varying_dirty_counts_share_bucket_programs(self):
        dim = 16
        idx = TpuFlatIndex(dim)
        rng = np.random.default_rng(0)
        vecs = rng.normal(size=(64, dim)).astype(np.float32)
        idx.insert_batch([f"n{i}" for i in range(64)], vecs)
        idx.search_batch(vecs[:1], 5)          # force initial upload
        before = _scatter_update._cache_size()
        # five waves with five DISTINCT dirty counts, all <= 8
        for wave, n_dirty in enumerate((3, 5, 7, 6, 8)):
            for i in range(n_dirty):
                idx.insert(f"n{i}", vecs[(i + wave + 1) % 64])
            idx.search_batch(vecs[:1], 5)      # sync
        added = _scatter_update._cache_size() - before
        assert added <= 2, (
            f"{added} scatter programs for counts bucketing to 4/8 — "
            "shape bucketing regressed")

    def test_padded_scatter_is_semantically_correct(self):
        dim = 16
        idx = TpuFlatIndex(dim)
        rng = np.random.default_rng(1)
        vecs = rng.normal(size=(32, dim)).astype(np.float32)
        idx.insert_batch([f"n{i}" for i in range(32)], vecs)
        idx.search_batch(vecs[:1], 5)
        # odd-count update wave (pads internally); results must reflect
        # the NEW values, and untouched rows must be unchanged
        nv = rng.normal(size=(3, dim)).astype(np.float32) + 4.0
        for i in range(3):
            idx.insert(f"n{i}", nv[i])
        hits = idx.search_batch(nv[:1], 3)[0]
        assert hits[0][0] == "n0"
        # a removal inside a padded wave must not resurrect anything
        idx.remove("n1")
        hits = idx.search_batch(nv[1:2], 5)[0]
        assert "n1" not in {h for h, _ in hits}
