"""Auth-layer primitives (SURVEY §2.6 F10/F11, routes/auth.js): password
KDF round-trip, RFC 7519 HS256 sign/verify with the downgrade holes
pinned shut, the Bearer middleware, and the full register/login flows
over the engine's tenant/user frames."""

from __future__ import annotations

import pytest

from xboard_spark import auth, ingest

SECRET = "your-secret-key-here"  # auth.js:9 default


# ------------------------------------------------------------- passwords


def test_password_roundtrip_and_uniqueness():
    h = auth.hash_password("hunter2")
    assert auth.verify_password("hunter2", h)
    assert not auth.verify_password("hunter3", h)
    assert not auth.verify_password("", h)
    # salted: same password twice -> different hashes, both verify
    h2 = auth.hash_password("hunter2")
    assert h != h2 and auth.verify_password("hunter2", h2)


def test_password_hash_is_self_describing():
    """The PHC string carries salt + cost params: verify needs no
    out-of-band config, and a future cost bump leaves old rows valid."""
    h = auth.hash_password("pw", salt=b"\x01" * 16)
    assert h.startswith("$scrypt$ln=14,r=8,p=1$")
    # deterministic under a pinned salt
    assert h == auth.hash_password("pw", salt=b"\x01" * 16)


def test_malformed_stored_hash_reads_as_invalid():
    for bad in ["", "nonsense", "$bcrypt$x$y$z", "$scrypt$ln=14$short"]:
        assert not auth.verify_password("pw", bad)


# ------------------------------------------------------------------- JWT


def test_jwt_roundtrip_claims_and_expiry():
    tok = auth.jwt_sign(
        {"userId": 7, "email": "a@x.com", "tenantId": 3}, SECRET, now=1_000
    )
    claims = auth.jwt_verify(tok, SECRET, now=1_000)
    assert (claims["userId"], claims["email"], claims["tenantId"]) == (
        7, "a@x.com", 3,
    )
    assert claims["exp"] == 1_000 + 7 * 24 * 3600  # auth.js expiresIn:'7d'
    # still valid one second before expiry, dead at expiry
    auth.jwt_verify(tok, SECRET, now=claims["exp"] - 1)
    with pytest.raises(auth.AuthError, match="expired"):
        auth.jwt_verify(tok, SECRET, now=claims["exp"])


def test_jwt_rejects_tampering_and_wrong_secret():
    tok = auth.jwt_sign({"userId": 7, "tenantId": 3}, SECRET, now=1_000)
    head, body, sig = tok.split(".")
    with pytest.raises(auth.AuthError):
        auth.jwt_verify(tok, "other-secret", now=1_000)
    # payload swap keeps the signature stale
    forged_body = auth._b64e(b'{"userId":7,"tenantId":999,"exp":9999999999}')
    with pytest.raises(auth.AuthError):
        auth.jwt_verify(f"{head}.{forged_body}.{sig}", SECRET, now=1_000)
    with pytest.raises(auth.AuthError):
        auth.jwt_verify("not-a-token", SECRET)


def test_jwt_rejects_non_object_body():
    """A correctly-signed token whose body is a JSON array/scalar must
    raise AuthError, never an AttributeError out of the middleware."""
    import hashlib
    import hmac as hmac_mod

    head = auth._b64e(b'{"alg":"HS256","typ":"JWT"}')
    body = auth._b64e(b'[1,2,3]')
    sig = auth._b64e(
        hmac_mod.new(
            SECRET.encode(), f"{head}.{body}".encode(), hashlib.sha256
        ).digest()
    )
    with pytest.raises(auth.AuthError, match="invalid"):
        auth.jwt_verify(f"{head}.{body}.{sig}", SECRET, now=0)


def test_jwt_rejects_alg_downgrade():
    """The classic holes: alg=none (no signature) and any alg taken from
    the attacker-controlled header must be rejected — only HS256."""
    tok = auth.jwt_sign({"userId": 1, "tenantId": 1}, SECRET, now=1_000)
    _, body, _ = tok.split(".")
    none_head = auth._b64e(b'{"alg":"none","typ":"JWT"}')
    for forged in [f"{none_head}.{body}.", f"{none_head}.{body}.AAAA"]:
        with pytest.raises(auth.AuthError):
            auth.jwt_verify(forged, SECRET, now=1_000)


def test_bearer_middleware():
    tok = auth.jwt_sign({"userId": 7, "tenantId": 3}, SECRET, now=1_000)
    claims = auth.authenticate_token(f"Bearer {tok}", SECRET, now=1_000)
    assert claims["tenantId"] == 3
    # RFC 7235: auth-scheme is case-insensitive (ADVICE r8) — the
    # reference middleware (auth.js:123) doesn't even look at the word
    for scheme in ["bearer", "BEARER", "BeArEr"]:
        assert (
            auth.authenticate_token(f"{scheme} {tok}", SECRET, now=1_000)[
                "tenantId"
            ]
            == 3
        )
    for bad in [None, "", "Bearer", "Basic xyz", tok]:
        with pytest.raises(auth.AuthError, match="required"):
            auth.authenticate_token(bad, SECRET, now=1_000)


def test_login_unknown_email_burns_kdf_cost():
    """ADVICE r8: unknown-email must not short-circuit before the KDF —
    the dummy-hash verify keeps timing uniform with wrong-password. Pin
    the mechanism (the dummy hash exists, is a real scrypt PHC string,
    and verifies only its unpresentable sentinel), not wall-clock."""
    dummy = auth._dummy_hash()
    assert dummy.startswith("$scrypt$")
    assert auth.verify_password(auth._DUMMY_HASH_INPUT, dummy)
    assert not auth.verify_password("s3cret!", dummy)
    assert auth._dummy_hash() is dummy  # lazy + cached, never recomputed


# ----------------------------------------------------------------- flows


def test_register_then_login_flow(spark):
    tenants = spark.createDataFrame([], ingest.TENANT_SCHEMA)
    users = spark.createDataFrame([], ingest.USER_SCHEMA)
    tenants, users, tid, token = auth.register(
        spark,
        tenants,
        users,
        email="owner@shop.example",
        password="s3cret!",
        shop_domain="shop.example",
        access_token="shpat_x",
        secret=SECRET,
        now=1_000,
    )
    assert tid == 1
    claims = auth.jwt_verify(token, SECRET, now=1_000)
    assert claims["tenantId"] == tid and claims["email"] == "owner@shop.example"
    # the stored hash is a real KDF output, not the password
    stored = users.first().password_hash
    assert stored.startswith("$scrypt$") and "s3cret!" not in stored

    tok2, info = auth.login(
        users, tenants, email="owner@shop.example", password="s3cret!",
        secret=SECRET, now=2_000,
    )
    assert auth.jwt_verify(tok2, SECRET, now=2_000)["userId"] == info["id"]
    assert info["shopDomain"] == "shop.example"

    # same AuthError message for unknown email and wrong password
    # (auth.js:85,94 — no account enumeration)
    with pytest.raises(auth.AuthError, match="invalid credentials"):
        auth.login(users, tenants, email="owner@shop.example",
                   password="wrong", secret=SECRET)
    with pytest.raises(auth.AuthError, match="invalid credentials"):
        auth.login(users, tenants, email="nobody@x.com",
                   password="s3cret!", secret=SECRET)


def test_login_null_hash_row_reads_as_invalid_credentials(spark):
    """A users row with password_hash = NULL (ingested from raw data
    rather than register()) must fail with the SAME uniform AuthError —
    never an AttributeError 500 — and must not be authenticatable via
    the dummy hash's public preimage (its verify outcome is ignored for
    rows without a real hash)."""
    tenants = spark.createDataFrame(
        [(1, "shop.example", "tok", None, None, "active", None, None)],
        ingest.TENANT_SCHEMA,
    )
    users = spark.createDataFrame(
        [(1, "raw@shop.example", None, 1, None)], ingest.USER_SCHEMA
    )
    for pw in ["anything", auth._DUMMY_HASH_INPUT]:
        with pytest.raises(auth.AuthError, match="invalid credentials"):
            auth.login(users, tenants, email="raw@shop.example",
                       password=pw, secret=SECRET)
    # verify_password's never-an-exception contract covers non-strings
    assert not auth.verify_password("pw", None)
    assert not auth.verify_password("pw", b"$scrypt$bytes")
