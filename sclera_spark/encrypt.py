"""Keyed wrapping of stored credentials — the engine never keeps a JDBC
password as plaintext catalog state.

Reference parity: util/encrypt/Encryptor.scala:28-50 (the reference
encrypts location passwords before they reach its catalog store). Here
the wrap is AES-256-GCM via the ``cryptography`` library when it is
importable; when it is not, the engine REFUSES to store a password at
registration time (``EncryptionUnavailable`` with remediation text)
rather than silently persisting plaintext — credentials must then be
supplied per-connect instead of registered.

Key sourcing, in order:
  1. ``SCLERA_SPARK_KEY`` env var — urlsafe-base64, 32 bytes after
     decode. Set this when location registrations must survive an
     engine restart (the same key decrypts the stored tokens).
  2. an ephemeral per-process random key — registrations then live
     exactly as long as the engine, and a PERSISTED catalog
     (SCLERA_SPARK_CATALOG_DIR) refuses to store secrets wrapped this
     way: a restarted process could never decrypt them, so persisting
     would silently mean "registrations don't survive restart"
     (engine._persist_locations raises instead).

Tokens are self-describing (``enc:gcm:<b64(nonce || ciphertext)>``) so
catalog dumps, LIST/DESCRIBE output and logs can carry them safely —
GCM's tag also authenticates, so a tampered token fails loudly instead
of decrypting to garbage.
"""

from __future__ import annotations

import base64
import os

_PREFIX = "enc:gcm:"
_AAD = b"sclera-location-secret"


class EncryptionUnavailable(RuntimeError):
    """Raised instead of EVER storing a plaintext credential."""


def _aesgcm():
    try:
        from cryptography.hazmat.primitives.ciphers.aead import AESGCM
    except ImportError as exc:  # pragma: no cover - lib present in CI
        raise EncryptionUnavailable(
            "refusing to store a plaintext password: the 'cryptography' "
            "library is not installed, so credentials cannot be wrapped. "
            "Install it, or omit the password from the location and "
            "supply credentials per connection instead."
        ) from exc
    return AESGCM


class Encryptor:
    def __init__(self, key: bytes | None = None):
        # ephemeral = the key dies with this process: tokens it wrapped
        # are garbage to any restarted engine, so a PERSISTED catalog
        # must refuse to store them (engine._persist_locations checks)
        self.ephemeral = False
        if key is None:
            env = os.environ.get("SCLERA_SPARK_KEY")
            if env:
                key = base64.urlsafe_b64decode(env)
            else:
                key = os.urandom(32)
                self.ephemeral = True
        if len(key) != 32:
            raise ValueError("SCLERA_SPARK_KEY must decode to 32 bytes")
        self._key = key

    @staticmethod
    def is_token(s) -> bool:
        return isinstance(s, str) and s.startswith(_PREFIX)

    def encrypt(self, plaintext: str) -> str:
        aesgcm = _aesgcm()
        nonce = os.urandom(12)
        ct = aesgcm(self._key).encrypt(nonce, plaintext.encode(), _AAD)
        return _PREFIX + base64.urlsafe_b64encode(nonce + ct).decode()

    def decrypt(self, token: str) -> str:
        if not self.is_token(token):
            raise ValueError("not an encrypted token")
        aesgcm = _aesgcm()
        raw = base64.urlsafe_b64decode(token[len(_PREFIX):])
        return aesgcm(self._key).decrypt(raw[:12], raw[12:], _AAD).decode()
