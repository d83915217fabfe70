"""At-rest whole-file encryption (AES-256-GCM).

Parity with reference crates/cortex-core/src/storage/encrypted.rs:10-41 and
the decrypt-on-boot / re-encrypt-on-shutdown guard in cortex-server
serve.rs:14-31,57-81. File format: 12-byte nonce || ciphertext+tag.
Key: CORTEX_ENCRYPTION_KEY env var, base64-encoded 32 bytes.
"""

from __future__ import annotations

import base64
import os
import tempfile
from typing import Optional

from cryptography.hazmat.primitives.ciphers.aead import AESGCM

from ..errors import ConfigError, StorageError

ENV_KEY = "CORTEX_ENCRYPTION_KEY"
NONCE_LEN = 12


def derive_key(b64: Optional[str] = None) -> bytes:
    raw = b64 if b64 is not None else os.environ.get(ENV_KEY)
    if not raw:
        raise ConfigError(f"{ENV_KEY} not set")
    try:
        key = base64.b64decode(raw)
    except Exception as e:  # noqa: BLE001
        raise ConfigError(f"{ENV_KEY} is not valid base64: {e}") from e
    if len(key) != 32:
        raise ConfigError(f"{ENV_KEY} must decode to 32 bytes, got {len(key)}")
    return key


def generate_key() -> str:
    return base64.b64encode(os.urandom(32)).decode()


def encrypt_file(plain_path: str, enc_path: str, key: bytes) -> None:
    nonce = os.urandom(NONCE_LEN)
    with open(plain_path, "rb") as f:
        data = f.read()
    ct = AESGCM(key).encrypt(nonce, data, None)
    tmp = enc_path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(nonce + ct)
    os.replace(tmp, enc_path)


def decrypt_file(enc_path: str, plain_path: str, key: bytes) -> None:
    with open(enc_path, "rb") as f:
        blob = f.read()
    if len(blob) < NONCE_LEN + 16:
        raise StorageError("encrypted file too short")
    nonce, ct = blob[:NONCE_LEN], blob[NONCE_LEN:]
    data = AESGCM(key).decrypt(nonce, ct, None)
    # tmp + rename: a crash mid-write must NEVER leave a truncated
    # plaintext at the working path — the next boot would mistake it
    # for a crash-orphan working copy (strictly-newer-than-.enc
    # semantics), resume from it, and re-encrypt the truncated file
    # over the only good ciphertext
    tmp = plain_path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, plain_path)


class EncryptedDbGuard:
    """Decrypt on enter; re-encrypt + remove plaintext on clean close.

    The plaintext working copy lives at a DETERMINISTIC path next to the
    encrypted file (``<enc_path>.plain``, same directory / filesystem —
    never a world-readable tempdir). Crash semantics (ADVICE r1 #1):

      * clean shutdown -> close() re-encrypts and removes the plaintext.
      * crash -> the plaintext (holding every write since the last clean
        shutdown or checkpoint) stays put. The NEXT boot detects the
        orphan and RESUMES FROM IT (loud warning), instead of silently
        decrypting the stale .enc and losing those writes while newer
        plaintext lingered in /tmp. SQLite WAL sidecars are preserved so
        the reopen replays uncommitted-to-main pages.
      * checkpoint(snapshot_fn) re-encrypts a consistent snapshot
        mid-flight, bounding the crash window (call it from a background
        loop with ``storage.snapshot``).

    Use:
        guard = EncryptedDbGuard(enc_path, key)
        storage = SqliteStorage(guard.plain_path)
        ... serve ...                      # optionally guard.checkpoint(
        storage.close(); guard.close()     #   storage.snapshot) on a timer
    """

    def __init__(self, enc_path: str, key: bytes):
        self.enc_path = enc_path
        self.key = key
        self.plain_path = enc_path + ".plain"
        self.recovered_from_crash = False
        if os.path.exists(self.plain_path):
            # Orphaned working copy from a crash: strictly newer than the
            # last clean re-encryption. Resume from it; the stale .enc is
            # refreshed at the next checkpoint/clean shutdown.
            import logging
            logging.getLogger(__name__).warning(
                "encrypted storage: found orphaned plaintext working copy "
                "%s (previous run did not shut down cleanly); resuming "
                "from it — it holds every write since the last "
                "re-encryption", self.plain_path)
            self.recovered_from_crash = True
        elif os.path.exists(enc_path) and os.path.getsize(enc_path) > 0:
            decrypt_file(enc_path, self.plain_path, key)
        # else: fresh database — let sqlite create the file

    def checkpoint(self, snapshot_fn) -> None:
        """Re-encrypt a consistent snapshot without stopping. snapshot_fn
        (e.g. ``SqliteStorage.snapshot``) must write a consistent copy of
        the live DB to the path it's given (the SQLite backup API does,
        WAL included)."""
        fd, tmp = tempfile.mkstemp(suffix=".db", prefix="cortex-ckpt-",
                                   dir=os.path.dirname(
                                       os.path.abspath(self.enc_path)))
        os.close(fd)
        try:
            snapshot_fn(tmp)
            encrypt_file(tmp, self.enc_path, self.key)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)

    def close(self) -> None:
        if os.path.exists(self.plain_path):
            # merge any committed-but-unmerged WAL pages into the main
            # file BEFORE encrypting: SqliteStorage runs WAL mode, and
            # close() can be reached with the connection still open
            # (guard-as-context-manager around a raised exception, CLI
            # finally blocks) — encrypting the main file alone and
            # deleting the -wal would silently drop those committed
            # transactions
            if os.path.exists(self.plain_path + "-wal"):
                import sqlite3
                try:
                    db = sqlite3.connect(self.plain_path)
                    try:
                        db.execute("PRAGMA wal_checkpoint(TRUNCATE)")
                    finally:
                        db.close()
                except sqlite3.Error:
                    # cannot merge: leave the plaintext + sidecars as a
                    # crash orphan (next boot resumes from them) rather
                    # than encrypt a main file missing committed pages
                    import logging
                    logging.getLogger(__name__).exception(
                        "WAL checkpoint before re-encryption failed; "
                        "leaving the working copy for next-boot "
                        "recovery instead of encrypting a partial db")
                    return
            encrypt_file(self.plain_path, self.enc_path, self.key)
            os.unlink(self.plain_path)
            for suffix in ("-wal", "-shm"):
                side = self.plain_path + suffix
                if os.path.exists(side):
                    os.unlink(side)

    def __enter__(self) -> "EncryptedDbGuard":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
