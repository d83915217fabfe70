"""Crash-consistency torture tests (VERDICT r2 #8).

kill -9 a child process mid-write-storm, reboot, and assert:
  * no ACKNOWLEDGED write is lost (SQLite WAL durability),
  * the stale index snapshot sidecar is rejected by its index_seq
    marker and rebuilt — every stored node answers searches again,
  * under encryption-at-rest, the orphan-plaintext recovery resumes
    from the working copy instead of the stale .enc.

Reference posture: redb ACID + preflight + repair bins
(crates/cortex-core/src/storage/redb_storage.rs:52-158).
"""

import base64
import json
import os
import signal
import subprocess
import sys
import textwrap
import time

import pytest

from cortex_tpu.api import Cortex
from cortex_tpu.config import CortexConfig
from cortex_tpu.storage.encrypted import EncryptedDbGuard, derive_key

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The storm child: opens the engine, snapshots once early, then stores
# nodes forever, appending each ACKNOWLEDGED id to acked.log (flushed +
# fsynced BEFORE the next store, so every logged id was really
# acknowledged by the engine before the crash).
_STORM = textwrap.dedent("""
    import os, sys
    sys.path.insert(0, {repo!r})
    import jax; jax.config.update("jax_platforms", "cpu")
    from cortex_tpu.api import Cortex
    from cortex_tpu.types import Node, Source

    db = sys.argv[1]
    acked_path = sys.argv[2]
    cx = Cortex.open(db)
    f = open(acked_path, "a")
    i = 0
    while True:
        n = Node.new("fact", f"storm fact number {{i}} with enough title",
                     f"body of storm fact {{i}}, long enough for checks",
                     Source(agent="storm"))
        cx.store(n)                      # store + index, acknowledged
        f.write(n.id + "\\n")
        f.flush(); os.fsync(f.fileno())
        if i == 5:
            cx.save_index_snapshot()     # early snapshot -> will go stale
            print("SNAPSHOTTED", flush=True)
        print("ACK", i, flush=True)
        i += 1
""")

_STORM_ENC = textwrap.dedent("""
    import os, sys
    sys.path.insert(0, {repo!r})
    import jax; jax.config.update("jax_platforms", "cpu")
    from cortex_tpu.api import Cortex
    from cortex_tpu.storage.encrypted import EncryptedDbGuard, derive_key
    from cortex_tpu.types import Node, Source

    enc = sys.argv[1]
    acked_path = sys.argv[2]
    guard = EncryptedDbGuard(enc, derive_key())
    cx = Cortex.open(guard.plain_path)
    f = open(acked_path, "a")
    i = 0
    while True:
        n = Node.new("fact", f"enc storm fact number {{i}} with title",
                     f"body of encrypted storm fact {{i}}, long enough",
                     Source(agent="storm"))
        cx.store(n)
        f.write(n.id + "\\n")
        f.flush(); os.fsync(f.fileno())
        if i == 3:
            # mid-flight encrypted checkpoint, as the serve loop does
            guard.checkpoint(cx.storage.snapshot)
            print("CHECKPOINTED", flush=True)
        print("ACK", i, flush=True)
        i += 1
""")


def _run_storm(script, args, *, wait_for, min_acks, env=None, timeout=120):
    """Start the child, wait until `wait_for` appeared on stdout AND at
    least min_acks ACK lines, then SIGKILL mid-write."""
    proc = subprocess.Popen(
        [sys.executable, "-u", "-c", script, *args],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env={**os.environ, **(env or {})})
    seen_marker = False
    acks = 0
    deadline = time.monotonic() + timeout
    try:
        for line in proc.stdout:
            if wait_for in line:
                seen_marker = True
            if line.startswith("ACK"):
                acks += 1
            if seen_marker and acks >= min_acks:
                break
            if time.monotonic() > deadline:
                raise TimeoutError(f"storm never reached {wait_for}/"
                                   f"{min_acks} acks")
    finally:
        # kill -9 mid-write: no atexit, no close(), no re-encrypt
        proc.kill()
        proc.wait()
    assert seen_marker and acks >= min_acks


class TestKill9WriteStorm:
    def test_no_acked_write_lost_and_stale_snapshot_rebuilt(self, tmp_path):
        db = str(tmp_path / "c.db")
        acked = str(tmp_path / "acked.log")
        _run_storm(_STORM.format(repo=REPO), [db, acked],
                   wait_for="SNAPSHOTTED", min_acks=20)

        acked_ids = [l.strip() for l in open(acked) if l.strip()]
        assert len(acked_ids) >= 20

        # the early snapshot is stale: its index_seq marker is behind
        meta = json.load(open(db + ".index.npz.meta"))
        cx = Cortex.open(db)
        try:
            assert cx.storage.index_seq() > meta["index_seq"]
            # durability: every acknowledged write survived kill -9
            for nid in acked_ids:
                assert cx.storage.get_node(nid) is not None, \
                    f"acknowledged write {nid} lost after kill -9"
            # the stale snapshot was REJECTED and the index rebuilt from
            # storage — every acked node is searchable, including those
            # stored after the snapshot
            for nid in acked_ids:
                assert nid in cx.index, \
                    f"{nid} missing from rebuilt index (stale snapshot?)"
        finally:
            cx.close()

    def test_clean_snapshot_loads_on_boot(self, tmp_path):
        """Control: a CURRENT snapshot is accepted (fast boot path)."""
        db = str(tmp_path / "c.db")
        cx = Cortex.open(db)
        n = Cortex.fact("control fact for the snapshot fast path")
        cx.store(n)
        cx.close()                       # close-time snapshot
        meta = json.load(open(db + ".index.npz.meta"))
        cx2 = Cortex.open(db)
        try:
            assert cx2.storage.index_seq() == meta["index_seq"]
            assert n.id in cx2.index
        finally:
            cx2.close()


class TestKill9Encrypted:
    def test_orphan_plaintext_recovery(self, tmp_path):
        from cortex_tpu.storage.encrypted import generate_key
        key_b64 = generate_key()
        enc = str(tmp_path / "c.db.enc")
        acked = str(tmp_path / "acked.log")
        _run_storm(_STORM_ENC.format(repo=REPO), [enc, acked],
                   wait_for="CHECKPOINTED", min_acks=10,
                   env={"CORTEX_ENCRYPTION_KEY": key_b64})

        acked_ids = [l.strip() for l in open(acked) if l.strip()]
        assert len(acked_ids) >= 10
        # crash leaves the orphaned plaintext working copy behind
        assert os.path.exists(enc + ".plain")

        guard = EncryptedDbGuard(enc, derive_key(key_b64))
        assert guard.recovered_from_crash, \
            "boot must resume from the orphan, not the stale .enc"
        cx = Cortex.open(guard.plain_path)
        try:
            for nid in acked_ids:
                assert cx.storage.get_node(nid) is not None, \
                    f"acknowledged write {nid} lost in encrypted crash"
        finally:
            cx.close()
            guard.close()
        # clean close re-encrypted and removed the plaintext
        assert not os.path.exists(enc + ".plain")
        assert os.path.getsize(enc) > 0

    def test_stale_enc_would_have_lost_writes(self, tmp_path):
        """Negative control: the stale .enc (from the mid-flight
        checkpoint) is genuinely missing post-checkpoint writes — the
        orphan recovery is what saves them."""
        from cortex_tpu.storage.encrypted import decrypt_file, generate_key
        key_b64 = generate_key()
        enc = str(tmp_path / "c.db.enc")
        acked = str(tmp_path / "acked.log")
        _run_storm(_STORM_ENC.format(repo=REPO), [enc, acked],
                   wait_for="CHECKPOINTED", min_acks=12,
                   env={"CORTEX_ENCRYPTION_KEY": key_b64})
        acked_ids = [l.strip() for l in open(acked) if l.strip()]

        stale = str(tmp_path / "stale.db")
        decrypt_file(enc, stale, derive_key(key_b64))
        cx = Cortex.open(stale)
        try:
            missing = [nid for nid in acked_ids
                       if cx.storage.get_node(nid) is None]
            assert missing, ("checkpoint captured everything — storm "
                             "didn't outpace it; test is vacuous")
        finally:
            cx.close()
