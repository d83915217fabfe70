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
    with open(plain_path, "wb") as f:
        f.write(data)


class EncryptedDbGuard:
    """Decrypt-to-temp on enter; re-encrypt + remove plaintext on close.

    Use:
        guard = EncryptedDbGuard(enc_path, key)
        storage = SqliteStorage(guard.plain_path)
        ... serve ...
        storage.close(); guard.close()
    """

    def __init__(self, enc_path: str, key: bytes):
        self.enc_path = enc_path
        self.key = key
        fd, self.plain_path = tempfile.mkstemp(suffix=".db", prefix="cortex-plain-")
        os.close(fd)
        if os.path.exists(enc_path) and os.path.getsize(enc_path) > 0:
            decrypt_file(enc_path, self.plain_path, key)
        else:
            os.unlink(self.plain_path)  # let sqlite create a fresh db file

    def close(self) -> None:
        if os.path.exists(self.plain_path):
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
