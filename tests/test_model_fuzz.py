"""Model-based consistency fuzz: random store/update/delete/search
interleavings against a trivial oracle (a dict of live nodes). After
every batch of operations the engine must agree EXACTLY with the
oracle: same live set in storage, same membership in the vector index,
searches never return dead or unknown ids.

Complements the targeted soaks — this explores operation orders nobody
thought to write a test for.
"""

import random

import pytest

from cortex_tpu.api import Cortex
from cortex_tpu.types import Node, Source


def run_fuzz(seed: int, ops: int = 200) -> None:
    rng = random.Random(seed)
    cx = Cortex.in_memory()
    live = {}          # id -> title   (the oracle)
    counter = 0

    for step in range(ops):
        r = rng.random()
        if r < 0.45 or not live:
            counter += 1
            n = Node.new("fact",
                         f"Fuzz node {counter} flavor {counter % 7}",
                         f"Body long enough for checks, entry {counter}.",
                         Source(agent=f"a{counter % 3}"))
            cx.store(n)
            live[n.id] = n.title
        elif r < 0.60:
            nid = rng.choice(list(live))
            n = cx.get_node(nid)
            n.body = f"Updated body long enough, step {step}."
            cx.update_node(n)
        elif r < 0.80:
            nid = rng.choice(list(live))
            hard = rng.random() < 0.5
            assert cx.delete_node(nid, hard=hard)
            del live[nid]
        else:
            hits = cx.search(f"fuzz node flavor {step % 7}", limit=8,
                             record_access=False)
            for _, n in hits:
                assert n.id in live, "search returned a dead node"

        if step % 25 == 24:
            stored = {n.id for n in cx.list_nodes() if not n.deleted}
            assert stored == set(live)
            assert len(cx.index) == len(live)
            for nid in live:
                assert nid in cx.index
    # final exact agreement
    stored = {n.id for n in cx.list_nodes() if not n.deleted}
    assert stored == set(live)
    assert len(cx.index) == len(live)
    cx.close()


@pytest.mark.parametrize("seed", [7, 99, 2026])
def test_model_fuzz(seed):
    run_fuzz(seed)
