"""Out-of-process decay sweep worker.

Maintenance isolation (r5): a full sweep at 10M+ edges is minutes of
CPU-bound host work (columnar scan, importance mapping, bulk persist).
In-process, Python's GIL lets that work convoy the serving event loop
— measured live: a 296 s sweep at 20.8M edges let only 23 HTTP
searches through a 60 s window on a 1-vCPU host, despite the lock-free
read path (the C-extension loops re-acquire the GIL aggressively and
starve the I/O thread). In its own PROCESS the OS scheduler timeshares
fairly and serving stays responsive; on multi-core hosts the sweep
rides a spare core outright.

The worker opens its own SQLite connections (WAL handles cross-process
writers; busy_timeout covers commit races), computes the sweep on the
HOST (the device election is forced off — a second process must not
re-initialize a tunneled TPU backend), persists through the same bulk
path, and reports counts as one JSON line on stdout.

Parity note: the decay SEMANTICS are unchanged
(crates/cortex-core/src/linker/decay.rs:21-101 — exponential decay
with importance shielding, manual exemption, delete-below-threshold);
only the execution venue moves.

Usage: python -m cortex_tpu.linker.decay_worker <db_path> <config_json>
"""

from __future__ import annotations

import json
import os
import sys


def main(argv) -> int:
    if len(argv) not in (2, 3):
        print(json.dumps(
            {"error": "usage: decay_worker <db> <cfg> [now]"}),
            flush=True)
        return 2
    db_path, cfg_json = argv[0], argv[1]
    now = float(argv[2]) if len(argv) == 3 else None
    # host-only sweep: importing jax is unavoidable (ops.decay), but
    # the bandwidth probe must not touch a (possibly tunneled) device
    # from a second process
    os.environ["CORTEX_DECAY_FORCE_HOST"] = "1"
    from ..storage.sqlite_store import SqliteStorage
    from .config import DecayConfig
    from .decay import DecayEngine

    cfg = DecayConfig(**json.loads(cfg_json))
    store = SqliteStorage(db_path, audit_enabled=True)
    try:
        eng = DecayEngine(store, cfg)
        pruned, deleted = eng.apply_decay(now)
        print(json.dumps({"pruned": pruned, "deleted": deleted}),
              flush=True)
        return 0
    finally:
        store.close()


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
