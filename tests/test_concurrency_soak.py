"""Concurrency soak: mixed writers / searchers / deleters hammer one
embedded engine. Shakes out the admission lock, the corpus generation
counter (freed-row reassignment during in-flight searches), and the
storage locks. The reference's closest analogue is its single
concurrent-read storage test; this goes further because the rebuild
serves from threads.
"""

import random
import threading
import time

import numpy as np
import pytest

from cortex_tpu.api import Cortex
from cortex_tpu.types import Edge, EdgeProvenance, Node, Source


class TestSoak:
    @pytest.mark.parametrize("index_kind", ["flat", "ivf"])
    def test_mixed_workload_no_corruption(self, tmp_path, index_kind):
        from cortex_tpu.config import CortexConfig
        cfg = CortexConfig()
        cfg.embedding.index = index_kind   # IVF shares the corpus-lock
        # protocol but adds its own slot bookkeeping + non-donating
        # scatters — soak both layouts
        cx = Cortex.open(str(tmp_path / "soak.db"), cfg)
        words = [f"topic{i}" for i in range(50)]
        errors = []
        stored_ids = []
        ids_lock = threading.Lock()
        stop = threading.Event()

        def writer(seed):
            rng = random.Random(seed)
            for i in range(30):
                w = rng.sample(words, 4)
                n = Node.new("fact",
                             f"soak w{seed} note {i} on {w[0]}",
                             f"Concurrent body {i}: {' '.join(w)}.",
                             Source(agent=f"w{seed}"))
                try:
                    cx.store(n)
                    with ids_lock:
                        stored_ids.append(n.id)
                except Exception as e:  # noqa: BLE001
                    errors.append(("write", repr(e)))

        def searcher(seed):
            rng = random.Random(seed)
            while not stop.is_set():
                try:
                    hits = cx.search(" ".join(rng.sample(words, 2)),
                                     limit=5)
                    for s, n in hits:
                        # every returned node must be live and readable
                        assert n.id is not None
                        assert np.isfinite(s)
                except Exception as e:  # noqa: BLE001
                    errors.append(("search", repr(e)))
                    return

        def deleter(seed):
            rng = random.Random(seed)
            while not stop.is_set():
                with ids_lock:
                    victim = (rng.choice(stored_ids)
                              if len(stored_ids) > 10 else None)
                if victim:
                    try:
                        cx.delete_node(victim, hard=rng.random() < 0.5)
                    except Exception as e:  # noqa: BLE001
                        errors.append(("delete", repr(e)))
                        return
                time.sleep(0.002)

        threads = ([threading.Thread(target=writer, args=(i,))
                    for i in range(3)]
                   + [threading.Thread(target=searcher, args=(90 + i,))
                      for i in range(2)]
                   + [threading.Thread(target=deleter, args=(80,))])
        for t in threads:
            t.start()
        for t in threads[:3]:
            t.join(timeout=120)
        stop.set()
        for t in threads[3:]:
            t.join(timeout=30)

        assert not errors, errors[:5]
        # engine is consistent afterwards: store, index and graph agree
        # EXACTLY — every live node is in the index and nothing else is
        # (the r1 soak flake was stale-put_node resurrection after a
        # concurrent delete; record_access is now an atomic conditional
        # bump, so no fudge factor is tolerated here)
        nodes = cx.list_nodes()
        assert all(n.embedding is not None for n in nodes)
        missing = [n.id for n in nodes if n.id not in cx.index]
        assert not missing, f"live nodes absent from index: {missing}"
        assert len(cx.index) == len(nodes)
        hits = cx.search("topic0 topic1", limit=3)
        for _, n in hits:
            assert not n.deleted
        cx.close()
        # durable reopen parity
        cx2 = Cortex.open(str(tmp_path / "soak.db"))
        assert cx2.stats().node_count == len(
            [n for n in nodes if not n.deleted])
        cx2.close()
