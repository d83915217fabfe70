"""Encryption-at-rest guard: crash recovery, checkpoints, clean cycle.

ADVICE r1 #1: a crash between boot and clean shutdown must never lose
writes (the old guard silently decrypted the stale .enc on next boot
while the newer plaintext lingered in /tmp)."""

import os

import pytest

from cortex_tpu.storage import SqliteStorage
from cortex_tpu.storage.encrypted import (EncryptedDbGuard, decrypt_file,
                                          derive_key, encrypt_file,
                                          generate_key)
from cortex_tpu.types import Node, Source


def mknode(title):
    return Node.new("fact", title, f"Body for {title} with enough text.",
                    Source(agent="t"))


@pytest.fixture
def key():
    return derive_key(generate_key())


class TestGuardCycle:
    def test_clean_roundtrip(self, tmp_path, key):
        enc = str(tmp_path / "db.enc")
        with EncryptedDbGuard(enc, key) as g:
            s = SqliteStorage(g.plain_path)
            n = mknode("Persisted across encryption cycle")
            s.put_node(n)
            s.close()
        assert os.path.exists(enc)
        assert not os.path.exists(enc + ".plain")
        # reopen: node is back
        with EncryptedDbGuard(enc, key) as g:
            s = SqliteStorage(g.plain_path)
            assert s.get_node(n.id) is not None
            s.close()

    def test_plaintext_lives_next_to_enc_not_tmp(self, tmp_path, key):
        enc = str(tmp_path / "db.enc")
        g = EncryptedDbGuard(enc, key)
        assert g.plain_path == enc + ".plain"
        g.close()

    def test_crash_recovery_resumes_from_plaintext(self, tmp_path, key):
        enc = str(tmp_path / "db.enc")
        # clean first run with one node
        with EncryptedDbGuard(enc, key) as g:
            s = SqliteStorage(g.plain_path)
            a = mknode("Write before the crash window")
            s.put_node(a)
            s.close()
        # second run writes another node, then CRASHES (no guard.close)
        g2 = EncryptedDbGuard(enc, key)
        s = SqliteStorage(g2.plain_path)
        b = mknode("Write that a crash must not lose")
        s.put_node(b)
        s.close()
        del g2                      # simulated crash: plaintext orphaned
        assert os.path.exists(enc + ".plain")
        # third boot: must resume from the orphan, keeping BOTH writes
        g3 = EncryptedDbGuard(enc, key)
        assert g3.recovered_from_crash
        s = SqliteStorage(g3.plain_path)
        assert s.get_node(a.id) is not None
        assert s.get_node(b.id) is not None, \
            "crash-window write silently lost (stale .enc restored)"
        s.close()
        g3.close()
        assert not os.path.exists(enc + ".plain")

    def test_checkpoint_bounds_crash_window(self, tmp_path, key):
        enc = str(tmp_path / "db.enc")
        g = EncryptedDbGuard(enc, key)
        s = SqliteStorage(g.plain_path)
        n = mknode("Checkpointed mid-flight write")
        s.put_node(n)
        g.checkpoint(s.snapshot)     # re-encrypt consistent snapshot
        s.close()
        # crash AND lose the plaintext entirely (worst case: disk swap)
        os.unlink(g.plain_path)
        for suffix in ("-wal", "-shm"):
            p = g.plain_path + suffix
            if os.path.exists(p):
                os.unlink(p)
        # the checkpointed .enc still holds the write
        with EncryptedDbGuard(enc, key) as g2:
            s2 = SqliteStorage(g2.plain_path)
            assert s2.get_node(n.id) is not None
            s2.close()

    def test_ciphertext_hides_content(self, tmp_path, key):
        enc = str(tmp_path / "db.enc")
        with EncryptedDbGuard(enc, key) as g:
            s = SqliteStorage(g.plain_path)
            s.put_node(mknode("SuperSecretMarkerString"))
            s.close()
        blob = open(enc, "rb").read()
        assert b"SuperSecretMarkerString" not in blob

    def test_wrong_key_fails(self, tmp_path, key):
        enc = str(tmp_path / "db.enc")
        with EncryptedDbGuard(enc, key) as g:
            s = SqliteStorage(g.plain_path)
            s.put_node(mknode("A node under the right key"))
            s.close()
        other = derive_key(generate_key())
        with pytest.raises(Exception):
            EncryptedDbGuard(enc, other)


class TestNoPlaintextSnapshotWhenEncrypted:
    def test_encrypted_close_writes_no_index_sidecar(self, tmp_path,
                                                     monkeypatch):
        """Encryption at rest must never leave a plaintext embedding
        snapshot next to the encrypted database."""
        import os
        monkeypatch.setenv("CORTEX_ENCRYPTION_KEY",
                           __import__("base64").b64encode(b"k" * 32).decode())
        from cortex_tpu.api import open_embedded
        from cortex_tpu.config import CortexConfig
        from cortex_tpu.types import Node, Source
        cfg = CortexConfig()
        cfg.server.data_dir = str(tmp_path)
        cfg.security.encryption_at_rest = True
        cx, guard = open_embedded(cfg)
        cx.store(Node.new("fact", "Encrypted snapshot check",
                          "Body long enough for the gate checks.",
                          Source(agent="t")))
        cx.close()
        guard.close()
        leaked = [f for f in os.listdir(tmp_path) if "index" in f]
        assert leaked == [], leaked
