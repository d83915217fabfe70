"""Differential fuzz: IVF at full probe must stay EXACTLY equivalent
to the flat exact scan through arbitrary mutation/search interleavings.

The equivalence claim (ivf.py module doc: 'nprobe = nlist reproduces
the flat oracle bit-for-bit') is load-bearing — every IVF correctness
argument reduces to it plus candidate-membership. This fuzz drives
random upsert / remove / update / rebuild / search sequences against
TpuIvfIndex(nprobe=nlist), ShardedIvfIndex(nprobe=nlist), and the
BruteForceIndex oracle, asserting identical ids and scores after every
search. Catches slot-bookkeeping bugs (stale slots after remove,
last-wins scatter collisions, retrain drift) that single-scenario
tests miss."""

import numpy as np
import pytest

from cortex_tpu.parallel import ShardedIvfIndex, build_mesh
from cortex_tpu.vector import BruteForceIndex, TpuIvfIndex, VectorFilter

DIM = 32
NLIST = 8


def _vec(rng):
    return rng.standard_normal(DIM).astype(np.float32)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("make_index", [
    lambda: TpuIvfIndex(DIM, nlist=NLIST, nprobe=NLIST),
    lambda: ShardedIvfIndex(DIM, build_mesh(8), nlist=NLIST,
                            nprobe=NLIST),
], ids=["single", "sharded"])
def test_ivf_full_probe_tracks_flat_oracle(seed, make_index):
    rng = np.random.default_rng(seed)
    ivf = make_index()
    oracle = BruteForceIndex(DIM)
    live = {}
    kinds = ["fact", "event", "decision"]
    next_id = 0

    for step in range(120):
        op = rng.choice(["insert", "insert", "insert", "update",
                         "remove", "rebuild", "search", "search"])
        if op == "insert" or (op in ("update", "remove")
                              and not live):
            nid = f"n{next_id}"
            next_id += 1
            v = _vec(rng)
            kind = kinds[int(rng.integers(len(kinds)))]
            ivf.insert(nid, v, kind=kind, source_agent="f")
            oracle.insert(nid, v, kind=kind, source_agent="f")
            live[nid] = kind
        elif op == "update":
            nid = str(rng.choice(list(live)))
            v = _vec(rng)
            ivf.insert(nid, v, kind=live[nid], source_agent="f")
            oracle.insert(nid, v, kind=live[nid], source_agent="f")
        elif op == "remove":
            nid = str(rng.choice(list(live)))
            assert ivf.remove(nid) == oracle.remove(nid)
            live.pop(nid)
        elif op == "rebuild":
            ivf.retrain()
        else:  # search
            q = _vec(rng)[None, :]
            k = int(rng.integers(1, 12))
            flt = None
            if rng.random() < 0.3:
                flt = VectorFilter(
                    kinds=[kinds[int(rng.integers(len(kinds)))]])
            if rng.random() < 0.15 and live:
                ex = list(rng.choice(list(live),
                                     size=min(3, len(live)),
                                     replace=False))
                flt = flt or VectorFilter()
                flt.exclude_ids = ex
            got = ivf.search_batch(q, k, flt)[0]
            want = oracle.search_batch(q, k, flt)[0]
            assert [i for i, _ in got] == [i for i, _ in want], \
                f"step {step}: ids diverged"
            np.testing.assert_allclose(
                [s for _, s in got], [s for _, s in want],
                atol=1e-5, err_msg=f"step {step}: scores diverged")
