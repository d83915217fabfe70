"""Serving-path load bench: the COMPOSED server under concurrent load.

Boots `cortex_tpu.server.serve` in a subprocess (warmup on), seeds a
corpus through the real admission pipeline, then drives concurrent
GET /search workers plus a concurrent gRPC SimilaritySearch burst and
reports sustained QPS and the read-side coalescing ratio
(requests per shared device dispatch).

This measures what a deployment actually gets — HTTP parsing, auth
middleware, the search batcher, decay re-rank, node hydration — not
just the kernel rate (`bench.py` measures that). Reference point: the
reference serves one HNSW walk per request on a CPU (<10ms/query class,
http/routes.rs:887-988) with no server-side aggregation.

Run: python benches/serving_load_bench.py [--platform cpu|device]
     [--conc 64] [--secs 6] [--nodes 60]
`--platform cpu` forces the virtual CPU backend (useful where the TPU
is busy or absent); default uses whatever JAX selects.
"""

import argparse
import asyncio
import json
import os
import signal
import socket
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))

SERVER_STUB = """
import logging, sys
logging.basicConfig(level=logging.WARNING)
sys.path.insert(0, {repo!r})
import jax
if {force_cpu!r} == "cpu":
    jax.config.update("jax_platforms", "cpu")
from cortex_tpu.config import CortexConfig
from cortex_tpu.server.serve import run
cfg = CortexConfig()
cfg.server.data_dir = {data_dir!r}
cfg.server.http_addr = "127.0.0.1:{http_port}"
cfg.server.grpc_addr = "127.0.0.1:{grpc_port}"
cfg.auto_linker.interval_secs = 3600.0
run(cfg)
"""


def free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


async def wait_health(sess, base, timeout=600):
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        try:
            async with sess.get(f"{base}/health") as r:
                if r.status == 200:
                    return
        except Exception:
            pass
        await asyncio.sleep(2)
    raise TimeoutError("server did not become healthy")


async def main_async(args):
    import aiohttp

    http_port, grpc_port = free_port(), free_port()
    data_dir = os.path.join(args.workdir, "data")
    stub = SERVER_STUB.format(repo=REPO, force_cpu=args.platform,
                              data_dir=data_dir, http_port=http_port,
                              grpc_port=grpc_port)
    proc = subprocess.Popen([sys.executable, "-u", "-c", stub],
                            stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL)
    base = f"http://127.0.0.1:{http_port}"
    try:
        timeout = aiohttp.ClientTimeout(total=590)
        async with aiohttp.ClientSession(timeout=timeout) as sess:
            await wait_health(sess, base)

            for i in range(args.nodes):
                r = await sess.post(
                    f"{base}/nodes?gate=skip",
                    headers={"x-gate-override": "true"},
                    json={"kind": "fact",
                          "title": f"Load corpus fact {i} cluster {i % 8}",
                          "body": "A body long enough for the gate about "
                                  f"topic cluster {i % 8} entry {i}."})
                assert r.status == 201, await r.text()

            async with sess.get(f"{base}/search",
                                params={"q": "warm", "limit": 5}) as r:
                await r.json()          # absorb any residual compile

            async def batch_stats():
                async with sess.get(f"{base}/metrics") as r:
                    text = await r.text()
                out = {}
                for line in text.splitlines():
                    if line.startswith("cortex_search_batch"):
                        k, v = line.split()
                        out[k] = float(v)
                return out
            before = await batch_stats()

            counts = [0] * args.conc
            stop = time.perf_counter() + args.secs

            async def worker(wid):
                n = 0
                while time.perf_counter() < stop:
                    async with sess.get(
                            f"{base}/search",
                            params={"q": f"topic cluster {n % 8}",
                                    "limit": 5}) as r:
                        assert r.status == 200
                        await r.json()
                    n += 1
                counts[wid] = n

            # gRPC burst runs CONCURRENTLY with the HTTP phase so both
            # surfaces demonstrably coalesce into the same batches
            def grpc_burst():
                from concurrent.futures import ThreadPoolExecutor
                from cortex_tpu.server import cortex_pb2 as pb
                from cortex_tpu.server.grpc_service import GrpcClient
                c = GrpcClient(f"127.0.0.1:{grpc_port}")
                try:
                    with ThreadPoolExecutor(8) as ex:
                        rs = list(ex.map(
                            lambda i: c.SimilaritySearch(
                                pb.SimilaritySearchRequest(
                                    query=f"cluster {i % 8}", limit=3)),
                            range(16)))
                    return sum(len(r.hits) for r in rs)
                finally:
                    c.close()

            t0 = time.perf_counter()
            results = await asyncio.gather(
                *[worker(i) for i in range(args.conc)],
                asyncio.to_thread(grpc_burst))
            dt = time.perf_counter() - t0
            grpc_hits = results[-1]

            after = await batch_stats()
            done = sum(counts)
            batches = (after.get("cortex_search_batches_total", 0)
                       - before.get("cortex_search_batches_total", 0)) or 1
            items = (after.get("cortex_search_batch_items_total", 0)
                     - before.get("cortex_search_batch_items_total", 0))
            print(json.dumps({
                "metric": f"served search QPS through the composed server "
                          f"(HTTP, {args.conc}-way concurrent, read-side "
                          f"coalescing on)",
                "value": round(done / dt, 1),
                "unit": "requests/sec",
                "requests": done,
                "grpc_burst_hits": grpc_hits,
                "requests_per_device_dispatch": round(items / batches, 1),
                "vs_baseline": round(done / dt / 100.0, 2)}), flush=True)
    finally:
        proc.send_signal(signal.SIGTERM)
        try:
            proc.wait(timeout=15)
        except subprocess.TimeoutExpired:
            proc.kill()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default="", choices=["", "cpu", "device"])
    ap.add_argument("--conc", type=int, default=64)
    ap.add_argument("--secs", type=float, default=6.0)
    ap.add_argument("--nodes", type=int, default=60)
    ap.add_argument("--workdir", default="/tmp/cortex-load-bench")
    args = ap.parse_args()
    os.makedirs(args.workdir, exist_ok=True)
    import shutil
    shutil.rmtree(os.path.join(args.workdir, "data"), ignore_errors=True)
    asyncio.run(main_async(args))


if __name__ == "__main__":
    main()
