"""Wire-server authentication: SCRAM-SHA-256 (RFC 5802/7677) and TLS
material helpers.

The reference's serving tier inherits real authentication from its
location DBMS (H2/PostgreSQL credentials — JDBCTestSuite.scala:24-93
connects through DriverManager with user/password); this engine's wire
server owns the port itself, so it must own auth too. SCRAM-SHA-256 is
PostgreSQL's default password scheme (pg 14+), implemented here from the
RFCs with stdlib hashlib/hmac only:

- the server stores NO password — only the derived verifier
  (salt, iteration count, StoredKey = H(ClientKey), ServerKey), exactly
  the pg `pg_authid.rolpassword` SCRAM verifier shape;
- a wire sniffer learns nothing replayable (nonce-bound proof), and the
  server proves knowledge of ServerKey back to the client (v=...);
- channel-binding: only the plain SCRAM-SHA-256 mechanism is advertised
  (not -PLUS), so clients send gs2 flag 'n' or 'y'; a 'p=...' demand is
  refused per RFC 5802 §6.

TLS: `make_self_signed_cert` produces a throwaway server certificate
(cryptography lib when present, `openssl req` subprocess otherwise) so
`sslmode=require` clients — psql/libpq in the interop suite — negotiate
real TLS against the server's SSLRequest path.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import os
import re
import secrets


class AuthFailed(Exception):
    """Authentication failed — reported as sqlstate 28P01 on the wire."""


class ScramCredential:
    """Server-side SCRAM-SHA-256 verifier for one user (RFC 5802 §3).

    Stores only derived keys, never the password: SaltedPassword =
    PBKDF2-HMAC-SHA256(password, salt, i); ClientKey/ServerKey are
    HMACs of it; StoredKey = SHA256(ClientKey). Proof verification can
    recover ClientKey from a valid proof but never the password."""

    __slots__ = ("salt", "iterations", "stored_key", "server_key")

    def __init__(self, salt: bytes, iterations: int, stored_key: bytes, server_key: bytes):
        self.salt = salt
        self.iterations = iterations
        self.stored_key = stored_key
        self.server_key = server_key

    @classmethod
    def from_password(
        cls, password: str, salt: bytes | None = None, iterations: int = 4096
    ) -> "ScramCredential":
        salt = salt if salt is not None else os.urandom(16)
        salted = hashlib.pbkdf2_hmac(
            "sha256", password.encode("utf-8"), salt, iterations
        )
        client_key = hmac.new(salted, b"Client Key", hashlib.sha256).digest()
        server_key = hmac.new(salted, b"Server Key", hashlib.sha256).digest()
        return cls(salt, iterations, hashlib.sha256(client_key).digest(), server_key)


_CLIENT_FIRST_RE = re.compile(r"^(n|y|p=([^,]*)),([^,]*),(.*)$", re.S)


def _attrs(msg: str) -> dict[str, str]:
    out: dict[str, str] = {}
    for part in msg.split(","):
        if len(part) >= 2 and part[1] == "=":
            out[part[0]] = part[2:]
    return out


class ScramExchange:
    """One connection's SCRAM-SHA-256 server state machine:
    ``first(client_first) -> server_first`` then
    ``final(client_final) -> server_final`` (or AuthFailed)."""

    def __init__(self, credential: ScramCredential):
        self.cred = credential
        self._server_first: str | None = None
        self._client_first_bare: str | None = None
        self._gs2_header: str | None = None
        self._nonce: str | None = None

    def first(self, client_first: bytes) -> bytes:
        m = _CLIENT_FIRST_RE.match(client_first.decode("utf-8", "strict"))
        if not m:
            raise AuthFailed("malformed SCRAM client-first message")
        flag, _cb_name, authzid, bare = m.groups()
        if flag.startswith("p"):
            # we advertise only SCRAM-SHA-256 (no -PLUS): a client that
            # DEMANDS channel binding is mis-negotiating — refuse
            raise AuthFailed("channel binding not offered by server")
        self._gs2_header = f"{flag},{authzid},"
        self._client_first_bare = bare
        attrs = _attrs(bare)
        if "m" in attrs:
            raise AuthFailed("SCRAM extensions not supported")
        cnonce = attrs.get("r")
        if not cnonce:
            raise AuthFailed("missing client nonce")
        # pg ignores the SASL n= username (startup-message user wins)
        self._nonce = cnonce + secrets.token_urlsafe(18)
        self._server_first = (
            f"r={self._nonce}"
            f",s={base64.b64encode(self.cred.salt).decode()}"
            f",i={self.cred.iterations}"
        )
        return self._server_first.encode()

    def final(self, client_final: bytes) -> bytes:
        if self._server_first is None:
            raise AuthFailed("SCRAM final before first")
        text = client_final.decode("utf-8", "strict")
        attrs = _attrs(text)
        if attrs.get("r") != self._nonce:
            raise AuthFailed("nonce mismatch")
        try:
            cbind = base64.b64decode(attrs.get("c", ""), validate=True)
        except ValueError:
            raise AuthFailed("malformed channel-binding data") from None
        # no channel binding in plain SCRAM-SHA-256: c = gs2 header only
        if cbind != self._gs2_header.encode():
            raise AuthFailed("channel-binding data mismatch")
        proof_b64 = attrs.get("p")
        if not proof_b64:
            raise AuthFailed("missing client proof")
        try:
            proof = base64.b64decode(proof_b64, validate=True)
        except ValueError:
            raise AuthFailed("malformed client proof") from None
        without_proof = text[: text.rindex(",p=")]
        auth_message = (
            f"{self._client_first_bare},{self._server_first},{without_proof}"
        ).encode()
        client_sig = hmac.new(
            self.cred.stored_key, auth_message, hashlib.sha256
        ).digest()
        if len(proof) != len(client_sig):
            raise AuthFailed("bad proof length")
        client_key = bytes(a ^ b for a, b in zip(proof, client_sig))
        if not hmac.compare_digest(
            hashlib.sha256(client_key).digest(), self.cred.stored_key
        ):
            raise AuthFailed("password authentication failed")
        server_sig = hmac.new(
            self.cred.server_key, auth_message, hashlib.sha256
        ).digest()
        return b"v=" + base64.b64encode(server_sig)


def make_self_signed_cert(out_dir: str, cn: str = "localhost") -> tuple[str, str]:
    """Write a throwaway self-signed server cert + key into ``out_dir``
    and return (certfile, keyfile). Prefers the `cryptography` package;
    falls back to the `openssl` CLI. Test/dev convenience — production
    deployments hand real PEM files to ScleraServer directly."""
    cert_path = os.path.join(out_dir, "server.crt")
    key_path = os.path.join(out_dir, "server.key")
    if os.path.exists(cert_path) and os.path.exists(key_path):
        return cert_path, key_path
    os.makedirs(out_dir, exist_ok=True)
    try:
        import datetime

        from cryptography import x509
        from cryptography.hazmat.primitives import hashes, serialization
        from cryptography.hazmat.primitives.asymmetric import rsa
        from cryptography.x509.oid import NameOID

        key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
        name = x509.Name([x509.NameAttribute(NameOID.COMMON_NAME, cn)])
        now = datetime.datetime.now(datetime.timezone.utc)
        cert = (
            x509.CertificateBuilder()
            .subject_name(name)
            .issuer_name(name)
            .public_key(key.public_key())
            .serial_number(x509.random_serial_number())
            .not_valid_before(now - datetime.timedelta(minutes=5))
            .not_valid_after(now + datetime.timedelta(days=365))
            .add_extension(
                x509.SubjectAlternativeName([x509.DNSName(cn)]), critical=False
            )
            .sign(key, hashes.SHA256())
        )
        with open(key_path, "wb") as fh:
            fh.write(
                key.private_bytes(
                    serialization.Encoding.PEM,
                    serialization.PrivateFormat.TraditionalOpenSSL,
                    serialization.NoEncryption(),
                )
            )
        with open(cert_path, "wb") as fh:
            fh.write(cert.public_bytes(serialization.Encoding.PEM))
    except ImportError:
        import subprocess

        subprocess.run(
            [
                "openssl", "req", "-x509", "-newkey", "rsa:2048",
                "-keyout", key_path, "-out", cert_path,
                "-days", "365", "-nodes", "-subj", f"/CN={cn}",
            ],
            check=True,
            capture_output=True,
        )
    os.chmod(key_path, 0o600)
    return cert_path, key_path


def make_ca_signed_cert(
    out_dir: str,
    cn: str = "localhost",
    san_dns: tuple[str, ...] = ("localhost",),
    san_ips: tuple[str, ...] = ("127.0.0.1",),
) -> tuple[str, str, str]:
    """Write a local CA plus a server certificate SIGNED BY that CA
    (SAN-bearing, so libpq's ``sslmode=verify-full`` hostname check
    passes for ``cn``/``san_*``) and return (certfile, keyfile,
    ca_certfile). This is the production-shaped chain: clients pin the
    CA via ``sslrootcert`` and get both encryption AND server identity;
    rotating the server cert re-signs under the same CA without
    touching clients. Requires the `cryptography` package (raises
    ImportError otherwise — the self-signed `make_self_signed_cert`
    path stays available for encrypt-only setups)."""
    cert_path = os.path.join(out_dir, "server-ca-signed.crt")
    key_path = os.path.join(out_dir, "server-ca-signed.key")
    ca_path = os.path.join(out_dir, "ca.crt")
    ca_key_path = os.path.join(out_dir, "ca.key")
    if all(os.path.exists(p) for p in (cert_path, key_path, ca_path)):
        return cert_path, key_path, ca_path
    os.makedirs(out_dir, exist_ok=True)
    import datetime
    import ipaddress

    from cryptography import x509
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import rsa
    from cryptography.x509.oid import NameOID

    now = datetime.datetime.now(datetime.timezone.utc)

    def _write_key(path, key):
        with open(path, "wb") as fh:
            fh.write(
                key.private_bytes(
                    serialization.Encoding.PEM,
                    serialization.PrivateFormat.TraditionalOpenSSL,
                    serialization.NoEncryption(),
                )
            )
        os.chmod(path, 0o600)

    ca_name = x509.Name(
        [x509.NameAttribute(NameOID.COMMON_NAME, "sclera-test-ca")]
    )
    if os.path.exists(ca_path) and os.path.exists(ca_key_path):
        # existing CA: re-sign a fresh server pair under it (rotation)
        with open(ca_key_path, "rb") as fh:
            ca_key = serialization.load_pem_private_key(fh.read(), None)
        with open(ca_path, "rb") as fh:
            ca_name = x509.load_pem_x509_certificate(fh.read()).subject
        ca_cert = None
    else:
        ca_key = rsa.generate_private_key(
            public_exponent=65537, key_size=2048
        )
        ca_cert = (
            x509.CertificateBuilder()
            .subject_name(ca_name)
            .issuer_name(ca_name)
            .public_key(ca_key.public_key())
            .serial_number(x509.random_serial_number())
            .not_valid_before(now - datetime.timedelta(minutes=5))
            .not_valid_after(now + datetime.timedelta(days=365))
            .add_extension(
                x509.BasicConstraints(ca=True, path_length=0), critical=True
            )
            .add_extension(
                x509.KeyUsage(
                    digital_signature=False, content_commitment=False,
                    key_encipherment=False, data_encipherment=False,
                    key_agreement=False, key_cert_sign=True, crl_sign=True,
                    encipher_only=False, decipher_only=False,
                ),
                critical=True,
            )
            .sign(ca_key, hashes.SHA256())
        )

    srv_key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    sans = [x509.DNSName(d) for d in san_dns] + [
        x509.IPAddress(ipaddress.ip_address(i)) for i in san_ips
    ]
    srv_cert = (
        x509.CertificateBuilder()
        .subject_name(
            x509.Name([x509.NameAttribute(NameOID.COMMON_NAME, cn)])
        )
        .issuer_name(ca_name)
        .public_key(srv_key.public_key())
        .serial_number(x509.random_serial_number())
        .not_valid_before(now - datetime.timedelta(minutes=5))
        .not_valid_after(now + datetime.timedelta(days=365))
        .add_extension(x509.SubjectAlternativeName(sans), critical=False)
        .add_extension(
            x509.BasicConstraints(ca=False, path_length=None), critical=True
        )
        .sign(ca_key, hashes.SHA256())
    )

    _write_key(key_path, srv_key)
    with open(cert_path, "wb") as fh:
        fh.write(srv_cert.public_bytes(serialization.Encoding.PEM))
    if ca_cert is not None:
        _write_key(ca_key_path, ca_key)
        with open(ca_path, "wb") as fh:
            fh.write(ca_cert.public_bytes(serialization.Encoding.PEM))
    return cert_path, key_path, ca_path
