"""Auth-layer primitives: the reference's register/login/JWT-middleware
surface (``routes/auth.js``) — the last two SURVEY §2.6 rows (F10
bcrypt, F11 JWT), previously documented out of engine scope.

These are driver-side, per-request primitives, not data-plane operators
— nothing here touches a DataFrame hot path. They exist so a user
porting XBoard has the full flow: ``register`` = duplicate-email check,
password hash, tenant+user insert-returning, token issue
(``auth.js:13-53``); ``login`` = user lookup join, password verify,
token issue (``auth.js:71-117``); ``authenticate_token`` = the Bearer
middleware (``auth.js:125-137``).

Documented divergences (both are container constraints, not corners):

* **F10**: the reference uses bcryptjs (``bcrypt.hash(pw, 10)``,
  ``auth.js:23``). bcrypt has no CPython stdlib implementation and this
  environment cannot vendor one; hand-rolling a crypto primitive would
  be worse than a divergence. ``hash_password`` uses **scrypt**
  (``hashlib.scrypt``, OpenSSL-backed, RFC 7914) — a memory-hard
  password KDF of the same family, emitted in a PHC-style string that
  carries its own salt and cost parameters, so the verify side needs no
  out-of-band config (same property as bcrypt's ``$2a$10$...`` format).
* **F11**: the reference signs HS256 JWTs with a 7-day expiry
  (``jwt.sign({userId,email,tenantId}, secret, {expiresIn:'7d'})``,
  ``auth.js:49-53``). HS256 is HMAC-SHA256 over base64url parts —
  implemented here exactly per RFC 7519 on stdlib ``hmac``; no
  divergence beyond the library. ``verify`` pins the algorithm to HS256
  (rejecting ``alg: none`` and any other downgrade) and enforces
  ``exp``.
"""

from __future__ import annotations

import base64
import functools
import hashlib
import hmac
import json
import os
import time

# scrypt cost: N=2^14, r=8, p=1 is the RFC 7914 interactive-login
# parameter set (~16 MiB, ~50 ms) — the same latency class as the
# reference's bcrypt cost 10.
_SCRYPT_N_LOG2 = 14
_SCRYPT_R = 8
_SCRYPT_P = 1
_DKLEN = 32

JWT_DEFAULT_EXPIRES_IN = 7 * 24 * 3600  # auth.js:52 expiresIn:'7d'


class AuthError(ValueError):
    """Raised on any verification failure (bad credentials, bad token).
    One exception type on purpose: the reference returns the same 401 for
    unknown email and wrong password (``auth.js:85,94`` — no account
    enumeration), and callers here get the same property."""


# --------------------------------------------------------------- passwords


def hash_password(password: str, *, salt: bytes | None = None) -> str:
    """F10 analog of ``bcrypt.hash(password, 10)`` (``auth.js:23``):
    one-way, salted, cost-parameterized. PHC-style output
    ``$scrypt$ln=14,r=8,p=1$<salt_b64>$<hash_b64>`` — self-describing,
    so stored hashes survive future cost bumps (verify reads the
    parameters from the string, exactly like bcrypt's format)."""
    if salt is None:
        salt = os.urandom(16)
    dk = hashlib.scrypt(
        password.encode("utf-8"),
        salt=salt,
        n=1 << _SCRYPT_N_LOG2,
        r=_SCRYPT_R,
        p=_SCRYPT_P,
        dklen=_DKLEN,
    )
    return (
        f"$scrypt$ln={_SCRYPT_N_LOG2},r={_SCRYPT_R},p={_SCRYPT_P}"
        f"${_b64e(salt)}${_b64e(dk)}"
    )


def verify_password(password: str, stored: str) -> bool:
    """F10 analog of ``bcrypt.compare`` (``auth.js:91``): constant-time
    comparison against the recomputed KDF; False (never an exception) on
    mismatch OR on a malformed stored hash — a corrupt row must read as
    invalid credentials, not a 500. Non-string stored values (a NULL
    column read, a bytes cell from a raw ingest) are malformed too."""
    if not isinstance(stored, str):
        return False
    try:
        _, scheme, params, salt_b64, hash_b64 = stored.split("$")
        if scheme != "scrypt":
            return False
        kv = dict(kv.split("=") for kv in params.split(","))
        dk = hashlib.scrypt(
            password.encode("utf-8"),
            salt=_b64d(salt_b64),
            n=1 << int(kv["ln"]),
            r=int(kv["r"]),
            p=int(kv["p"]),
            dklen=len(_b64d(hash_b64)),
        )
        return hmac.compare_digest(dk, _b64d(hash_b64))
    except (ValueError, KeyError):
        return False


# --------------------------------------------------------------------- JWT


def _b64e(raw: bytes) -> str:
    return base64.urlsafe_b64encode(raw).rstrip(b"=").decode("ascii")


def _b64d(s: str) -> bytes:
    return base64.urlsafe_b64decode(s + "=" * (-len(s) % 4))


def jwt_sign(
    payload: dict,
    secret: str,
    *,
    expires_in: int = JWT_DEFAULT_EXPIRES_IN,
    now: int | None = None,
) -> str:
    """F11 analog of ``jwt.sign(payload, secret, {expiresIn:'7d'})``
    (``auth.js:49-53``): RFC 7519 HS256. ``now`` is injectable for
    deterministic tests; production callers omit it."""
    now = int(time.time()) if now is None else int(now)
    header = {"alg": "HS256", "typ": "JWT"}
    body = {**payload, "iat": now, "exp": now + int(expires_in)}
    signing_input = (
        _b64e(json.dumps(header, separators=(",", ":")).encode())
        + "."
        + _b64e(json.dumps(body, separators=(",", ":")).encode())
    )
    sig = hmac.new(
        secret.encode("utf-8"), signing_input.encode("ascii"), hashlib.sha256
    ).digest()
    return signing_input + "." + _b64e(sig)


def jwt_verify(token: str, secret: str, *, now: int | None = None) -> dict:
    """F11 analog of ``jwt.verify`` (``auth.js:129``): checks structure,
    pins the algorithm to HS256 (an ``alg`` taken from the attacker's
    header is the classic downgrade hole — ``none`` and algorithm
    confusion are both rejected here), constant-time signature check,
    then ``exp``. Returns the claims dict; raises ``AuthError``."""
    now = int(time.time()) if now is None else int(now)
    parts = token.split(".")
    if len(parts) != 3:
        raise AuthError("malformed token")
    head_b64, body_b64, sig_b64 = parts
    try:
        header = json.loads(_b64d(head_b64))
        claims = json.loads(_b64d(body_b64))
        sig = _b64d(sig_b64)
    except (ValueError, UnicodeDecodeError) as exc:
        raise AuthError("malformed token") from exc
    if not isinstance(header, dict) or header.get("alg") != "HS256":
        raise AuthError("invalid token")
    if not isinstance(claims, dict):
        # a signed-but-non-object body (JSON array/scalar) must read as
        # a bad token, not crash the middleware with an AttributeError
        raise AuthError("invalid token")
    expect = hmac.new(
        secret.encode("utf-8"),
        (head_b64 + "." + body_b64).encode("ascii"),
        hashlib.sha256,
    ).digest()
    if not hmac.compare_digest(sig, expect):
        raise AuthError("invalid token")
    exp = claims.get("exp")
    if not isinstance(exp, (int, float)) or now >= exp:
        raise AuthError("token expired")
    return claims


def authenticate_token(
    authorization_header: str | None, secret: str, *, now: int | None = None
) -> dict:
    """The ``authenticateToken`` middleware (``auth.js:125-137``): parse
    ``Bearer <token>`` out of the Authorization header, verify, return
    the claims the handlers read ``tenantId`` from (``analytics.js:30``
    — the tenant filter comes from HERE, never the URL)."""
    if not authorization_header:
        raise AuthError("access token required")
    scheme, _, token = authorization_header.partition(" ")
    # RFC 7235 auth-scheme tokens are case-insensitive ("bearer <tok>"
    # must authenticate); the reference middleware (auth.js:123) ignores
    # the scheme word entirely — requiring *a* Bearer scheme is kept as
    # the stricter-than-reference part, the casing is not.
    if scheme.lower() != "bearer" or not token:
        raise AuthError("access token required")
    return jwt_verify(token, secret, now=now)


# ------------------------------------------------------------------- flows


# Dummy hash for the unknown-email login path: verifying against it costs
# the same scrypt work as a real verify, so response TIMING no longer
# distinguishes "email not found" (previously near-zero) from "wrong
# password" (~50 ms KDF). The reference has that timing leak
# (auth.js:85 returns before bcrypt.compare runs); here the error message
# AND the latency are uniform. Fixed salt on purpose — it hashes a
# password no caller can present, its only job is burning the KDF cost.
# Computed lazily on first use: the KDF costs ~50 ms and ~16 MB, which
# doesn't belong on the import path of sessions that never call login().
_DUMMY_HASH_INPUT = "!dummy-equal-cost-verify!"


@functools.lru_cache(maxsize=1)
def _dummy_hash() -> str:
    return hash_password(_DUMMY_HASH_INPUT, salt=b"xboard-dummy-salt")


def register(
    spark,
    tenants,
    users,
    *,
    email: str,
    password: str,
    shop_domain: str,
    access_token: str,
    secret: str,
    scopes: str = "read_customers,read_orders,read_products",
    now: int | None = None,
):
    """The full register flow (``auth.js:13-66``): hash the password,
    run the engine-side duplicate-check + tenant/user insert-returning
    (``ingest.register_tenant``), issue the 7-day token. Returns
    ``(tenants', users', tenant_id, token)``. The background ingestion
    kickoff (``auth.js:44-46``) stays the caller's separate action, as
    in ``register_tenant``'s contract."""
    from xboard_spark.ingest import register_tenant

    new_tenants, new_users, tenant_id = register_tenant(
        spark,
        tenants,
        users,
        shop_domain=shop_domain,
        access_token=access_token,
        email=email,
        password_hash=hash_password(password),
        scopes=scopes,
    )
    user_id = (
        new_users.filter(new_users.email == email).select("id").first().id
    )
    token = jwt_sign(
        {"userId": user_id, "email": email, "tenantId": tenant_id},
        secret,
        now=now,
    )
    return new_tenants, new_users, tenant_id, token


def login(
    users,
    tenants,
    *,
    email: str,
    password: str,
    secret: str,
    now: int | None = None,
) -> tuple[str, dict]:
    """The login flow (``auth.js:71-117``): user row by email joined to
    its tenant (for ``shop_domain``), password verify, token issue.
    Returns ``(token, user_info)``; raises ``AuthError`` with the SAME
    message for unknown email and wrong password (``auth.js:85,94``),
    and — beyond the reference, which short-circuits before
    ``bcrypt.compare`` on unknown email — burns the same KDF cost on
    both paths (dummy-hash verify), so timing doesn't enumerate either.

    Scale note: email lookup on a users table is a point query; at any
    real scale this frame is a dimension (thousands of rows per tenant
    fleet, not 100 TB) and the filter is a pruned scan."""
    row = (
        users.filter(users.email == email)
        .join(tenants.withColumnRenamed("id", "tenant_id"), "tenant_id")
        .select("id", "email", "password_hash", "tenant_id", "shop_domain")
        .first()
    )
    # rows with a NULL/non-string hash take the dummy path too: same
    # uniform AuthError AND the same KDF cost (a fast-fail on a
    # NULL-hash row would time-distinguish it from a wrong password).
    # The dummy verify's outcome is deliberately ignored for such rows —
    # its preimage is a public constant in this file, so matching it
    # must never authenticate an account that has no real hash.
    stored = row.password_hash if row is not None else None
    has_real_hash = isinstance(stored, str) and bool(stored)
    ok = verify_password(password, stored if has_real_hash else _dummy_hash())
    if row is None or not has_real_hash or not ok:
        raise AuthError("invalid credentials")
    token = jwt_sign(
        {"userId": row.id, "email": row.email, "tenantId": row.tenant_id},
        secret,
        now=now,
    )
    return token, {
        "id": row.id,
        "email": row.email,
        "tenantId": row.tenant_id,
        "shopDomain": row.shop_domain,
    }
