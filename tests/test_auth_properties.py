"""Property tests for the auth primitives: JWT sign/verify round-trip
over arbitrary claims, password KDF round-trip over arbitrary unicode,
and the self-describing-hash claim (stored strings verify under cost
parameters DIFFERENT from the current defaults — the property that
makes future cost bumps safe for existing rows). Pure driver-side; no
Spark fixture needed."""

from __future__ import annotations

import base64
import hashlib
import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from xboard_spark import auth

SECRET = "s"

# JSON-scalar claim values the reference actually puts in tokens
# (ints and strings); keys avoid the reserved iat/exp which sign() owns.
claims_strategy = st.dictionaries(
    st.text(min_size=1, max_size=10).filter(lambda k: k not in ("iat", "exp")),
    st.one_of(st.integers(-(2**31), 2**31), st.text(max_size=20)),
    max_size=5,
)


@settings(max_examples=50, deadline=None)
@given(payload=claims_strategy, now=st.integers(0, 2**31), life=st.integers(1, 10**6))
def test_jwt_roundtrip_property(payload, now, life):
    tok = auth.jwt_sign(payload, SECRET, expires_in=life, now=now)
    claims = auth.jwt_verify(tok, SECRET, now=now)
    for k, v in payload.items():
        assert claims[k] == v
    assert claims["iat"] == now and claims["exp"] == now + life
    # expiry boundary is half-open: valid at exp-1, dead at exp
    auth.jwt_verify(tok, SECRET, now=now + life - 1)
    try:
        auth.jwt_verify(tok, SECRET, now=now + life)
        assert False, "expired token verified"
    except auth.AuthError:
        pass


@settings(
    max_examples=10,  # scrypt is deliberately ~50ms/call
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(pw=st.text(max_size=64), other=st.text(max_size=64))
def test_password_roundtrip_property(pw, other):
    h = auth.hash_password(pw)
    assert auth.verify_password(pw, h)
    if other != pw:
        assert not auth.verify_password(other, h)


def test_verify_honors_parameters_from_the_stored_string():
    """A row hashed under a DIFFERENT (here: cheaper) cost than today's
    default must still verify — proof that verify reads ln/r/p from the
    PHC string rather than assuming the current constants."""
    salt = b"\x02" * 16
    dk = hashlib.scrypt(b"pw", salt=salt, n=1 << 12, r=4, p=2, dklen=32)
    b64 = lambda b: base64.urlsafe_b64encode(b).rstrip(b"=").decode()
    stored = f"$scrypt$ln=12,r=4,p=2${b64(salt)}${b64(dk)}"
    assert auth.verify_password("pw", stored)
    assert not auth.verify_password("pW", stored)


def test_jwt_payload_is_inspectable_but_not_forgeable():
    """RFC 7519: the payload is base64url JSON (readable by anyone —
    tokens are not encryption), but any bit-flip breaks the signature."""
    tok = auth.jwt_sign({"tenantId": 3}, SECRET, now=0)
    body = tok.split(".")[1]
    decoded = json.loads(
        base64.urlsafe_b64decode(body + "=" * (-len(body) % 4))
    )
    assert decoded["tenantId"] == 3
    tampered = tok[:-2] + ("AA" if tok[-2:] != "AA" else "BB")
    try:
        auth.jwt_verify(tampered, SECRET, now=0)
        assert False, "tampered token verified"
    except auth.AuthError:
        pass
