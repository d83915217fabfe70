"""Multi-chip search: the corpus sharded over a device mesh.

Demonstrates the scale-out layer (parallel/): a ShardedFlatIndex lays
embedding rows across all available devices and searches with one
shard_map (per-shard matmul + top-k, exact ICI merge). Runs anywhere —
on a CPU-only machine, set the env vars below to emulate 8 devices:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    JAX_PLATFORMS=cpu python examples/sharded_search.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

from cortex_tpu.parallel import ShardedFlatIndex, build_mesh
from cortex_tpu.vector import VectorFilter


def main():
    mesh = build_mesh()
    print(f"mesh: {mesh.devices.size} x {mesh.devices.flat[0].platform}")

    idx = ShardedFlatIndex(dim=128, mesh=mesh)
    rng = np.random.default_rng(0)
    n = 10_000
    vecs = rng.normal(size=(n, 128)).astype(np.float32)
    idx.insert_batch(
        [f"doc-{i}" for i in range(n)], vecs,
        kinds=["fact" if i % 4 else "decision" for i in range(n)],
        agents=[f"agent-{i % 3}" for i in range(n)])
    print(f"indexed {len(idx)} vectors across {mesh.devices.size} shards")

    # exact global top-k, merged over ICI
    hits = idx.search_batch(vecs[:3], 5)
    for b, row in enumerate(hits):
        ids = [i for i, _ in row]
        assert ids[0] == f"doc-{b}"    # self-retrieval across shards
        print(f"query {b}: {ids}")

    # filters apply inside the shard_map (no post-filtering over-fetch)
    filtered = idx.search_batch(vecs[:1], 5,
                                VectorFilter(kinds=["decision"]))
    print("decision-only:", [i for i, _ in filtered[0]])


if __name__ == "__main__":
    main()
