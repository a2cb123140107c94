"""TenantContext unit tests (A9 parity: claim extraction + expiry)."""

import json

import pytest

from aws_saas_factory_multi_tenant_data_pipeline_spark.tenancy import (
    TenantContext,
    TenantError,
    from_claims,
)


def test_valid_claims():
    ctx = from_claims({"custom:tenantId": "acme", "exp": 2_000_000_000}, now_epoch=1_700_000_000)
    assert ctx.tenant_id == "acme"


def test_expired_token_rejected():
    with pytest.raises(TenantError, match="expired"):
        from_claims({"custom:tenantId": "acme", "exp": 1_000}, now_epoch=2_000)


def test_missing_claim_rejected():
    with pytest.raises(TenantError, match="custom:tenantId"):
        from_claims({"exp": 2_000_000_000}, now_epoch=1_000)


@pytest.mark.parametrize("bad", ["", "a b", "x" * 65, "tenant;drop", None])
def test_malformed_tenant_ids_rejected(bad):
    with pytest.raises(TenantError):
        TenantContext(bad)


def test_sql_injection_shape_rejected():
    with pytest.raises(TenantError):
        TenantContext("t' OR '1'='1")


def test_from_token_with_verifier_hook():
    """Pluggable signature verification (authorizer app.py:50-67 parity):
    the verifier's claims flow into expiry + tenant extraction."""
    from aws_saas_factory_multi_tenant_data_pipeline_spark.tenancy import from_token

    def good_verifier(token):
        assert token == "header.payload.sig"
        return {"custom:tenantId": "acme", "exp": 2_000_000_000}

    ctx = from_token("header.payload.sig", good_verifier, now_epoch=1_900_000_000)
    assert ctx.tenant_id == "acme"

    def bad_sig_verifier(token):
        raise RuntimeError("signature mismatch")

    with pytest.raises(TenantError, match="verification failed"):
        from_token("header.payload.sig", bad_sig_verifier)

    def expired_verifier(token):
        return {"custom:tenantId": "acme", "exp": 100}

    with pytest.raises(TenantError, match="expired"):
        from_token("header.payload.sig", expired_verifier, now_epoch=200)


def test_unverified_claims_decode_and_malformed():
    import base64
    import json as _json

    from aws_saas_factory_multi_tenant_data_pipeline_spark.tenancy import unverified_claims

    payload = base64.urlsafe_b64encode(
        _json.dumps({"custom:tenantId": "t-9"}).encode()
    ).decode().rstrip("=")
    assert unverified_claims(f"h.{payload}.s")["custom:tenantId"] == "t-9"
    with pytest.raises(TenantError, match="malformed"):
        unverified_claims("no-dots-here")


# ---------------------------------------------------------------------------
# RS256 verification (pure-stdlib JWKS path)
# ---------------------------------------------------------------------------

# fixed 512-bit primes (deterministic fixture; generated once with
# Miller-Rabin) so tests need no key-generation or crypto dependency
_P = int(
    "80e114133015ea44ba8044d3b296ffea2d1f08ffed42094a241c0227a9675b63"
    "741eb24025b01d64b21cb3963bb0dec0319230b23295e25f04ee5a1e34ccc9cf", 16
)
_Q = int(
    "d1a8a8538565fb33d5ec6d6a30e626f8445b4d7ac6ff7e910acbe347081bd963"
    "05849ec91a5a30f237e08d16f549e84d05ec0e23e9b17bdeb292a5bf8ecc2993", 16
)
_N = _P * _Q
_E = 65537
_D = pow(_E, -1, (_P - 1) * (_Q - 1))


def _b64u(b: bytes) -> str:
    import base64

    return base64.urlsafe_b64encode(b).rstrip(b"=").decode()


def _jwks(kid="k1"):
    klen = (_N.bit_length() + 7) // 8
    return {
        "keys": [
            {
                "kty": "RSA",
                "kid": kid,
                "n": _b64u(_N.to_bytes(klen, "big")),
                "e": _b64u(_E.to_bytes(3, "big")),
            }
        ]
    }


def _sign_rs256(claims: dict, kid="k1", alg="RS256", tamper=False) -> str:
    import hashlib
    import json as _json

    header = {"alg": alg, "kid": kid, "typ": "JWT"}
    h64 = _b64u(_json.dumps(header).encode())
    p64 = _b64u(_json.dumps(claims).encode())
    digestinfo = bytes.fromhex("3031300d060960864801650304020105000420")
    t = digestinfo + hashlib.sha256(f"{h64}.{p64}".encode()).digest()
    k = (_N.bit_length() + 7) // 8
    em = b"\x00\x01" + b"\xff" * (k - 3 - len(t)) + b"\x00" + t
    sig = pow(int.from_bytes(em, "big"), _D, _N).to_bytes(k, "big")
    if tamper:
        sig = sig[:-1] + bytes([sig[-1] ^ 1])
    return f"{h64}.{p64}.{_b64u(sig)}"


def test_rs256_valid_token_end_to_end():
    from aws_saas_factory_multi_tenant_data_pipeline_spark.tenancy import from_token, rs256_verifier

    tok = _sign_rs256({"custom:tenantId": "t42", "exp": 4_000_000_000})
    ctx = from_token(tok, rs256_verifier(_jwks()))
    assert ctx.tenant_id == "t42"


def test_rs256_rejects_bad_signature():
    import pytest

    from aws_saas_factory_multi_tenant_data_pipeline_spark.tenancy import TenantError, from_token, rs256_verifier

    tok = _sign_rs256({"custom:tenantId": "t42"}, tamper=True)
    with pytest.raises(TenantError, match="verification failed"):
        from_token(tok, rs256_verifier(_jwks()))


def test_rs256_rejects_payload_tampering():
    import pytest

    from aws_saas_factory_multi_tenant_data_pipeline_spark.tenancy import TenantError, from_token, rs256_verifier

    tok = _sign_rs256({"custom:tenantId": "t42"})
    h64, p64, s64 = tok.split(".")
    forged_payload = _b64u(json.dumps({"custom:tenantId": "other"}).encode())
    forged = f"{h64}.{forged_payload}.{s64}"
    with pytest.raises(TenantError):
        from_token(forged, rs256_verifier(_jwks()))


def test_rs256_rejects_alg_downgrade():
    import pytest

    from aws_saas_factory_multi_tenant_data_pipeline_spark.tenancy import TenantError, rs256_verifier

    for alg in ("none", "HS256"):
        tok = _sign_rs256({"custom:tenantId": "t42"}, alg=alg)
        with pytest.raises(TenantError, match="unsupported alg"):
            rs256_verifier(_jwks())(tok)


def test_rs256_rejects_unknown_kid_and_expiry():
    import pytest

    from aws_saas_factory_multi_tenant_data_pipeline_spark.tenancy import TenantError, from_token, rs256_verifier

    tok = _sign_rs256({"custom:tenantId": "t42"}, kid="other")
    with pytest.raises(TenantError, match="no JWKS key"):
        rs256_verifier(_jwks())(tok)
    # signature valid but expired → authorizer's 401 path via from_claims
    tok = _sign_rs256({"custom:tenantId": "t42", "exp": 100})
    with pytest.raises(TenantError, match="expired"):
        from_token(tok, rs256_verifier(_jwks()), now_epoch=200)


# ---------------------------------------------------------------------------
# CachedAuthorizer: JWKS fetch/refresh + 5-min decision cache (A9 parity)
# ---------------------------------------------------------------------------


class _Clock:
    def __init__(self, t=1_000_000.0):
        self.t = t

    def __call__(self):
        return self.t


def test_cached_authorizer_file_url_and_decision_cache(tmp_path):
    import json as _json

    from aws_saas_factory_multi_tenant_data_pipeline_spark.tenancy import CachedAuthorizer

    jwks_file = tmp_path / "jwks.json"
    jwks_file.write_text(_json.dumps(_jwks()))
    clock = _Clock()
    auth = CachedAuthorizer(jwks_file.as_uri(), clock=clock)
    tok = _sign_rs256({"custom:tenantId": "t42", "exp": 4_000_000_000})
    assert auth.authorize(tok).tenant_id == "t42"
    assert auth.fetch_count == 1
    # within the decision TTL the cached verdict answers — even if the
    # JWKS source disappears entirely
    jwks_file.unlink()
    clock.t += 299
    assert auth.authorize(tok).tenant_id == "t42"
    assert auth.fetch_count == 1


def test_cached_authorizer_reverifies_after_ttl():
    import pytest

    from aws_saas_factory_multi_tenant_data_pipeline_spark.tenancy import (
        CachedAuthorizer,
        TenantError,
    )

    calls = []

    def fetch(url):
        calls.append(url)
        return _jwks()

    clock = _Clock()
    auth = CachedAuthorizer(
        "https://pool/jwks.json", decision_ttl=300, jwks_ttl=600, fetch=fetch, clock=clock
    )
    tok = _sign_rs256({"custom:tenantId": "t1", "exp": 4_000_000_000})
    assert auth.authorize(tok).tenant_id == "t1"
    assert len(calls) == 1
    # decision TTL elapses → re-verify against the still-fresh JWKS (no refetch)
    clock.t += 301
    assert auth.authorize(tok).tenant_id == "t1"
    assert len(calls) == 1
    # JWKS TTL elapses too → next miss refetches the document
    clock.t += 600
    assert auth.authorize(tok).tenant_id == "t1"
    assert len(calls) == 2
    # deny decisions cache for the TTL as well (API Gateway semantics)
    bad = _sign_rs256({"custom:tenantId": "t1"}, tamper=True)
    with pytest.raises(TenantError):
        auth.authorize(bad)
    n_after_deny = len(calls)
    with pytest.raises(TenantError):
        auth.authorize(bad)
    assert len(calls) == n_after_deny


def test_cached_authorizer_refetches_on_rotated_kid():
    from aws_saas_factory_multi_tenant_data_pipeline_spark.tenancy import CachedAuthorizer

    served = [_jwks(kid="old"), _jwks(kid="new"), _jwks(kid="new")]
    calls = []

    def fetch(url):
        calls.append(url)
        return served[min(len(calls) - 1, len(served) - 1)]

    clock = _Clock()
    auth = CachedAuthorizer("https://pool/jwks.json", fetch=fetch, clock=clock)
    tok = _sign_rs256({"custom:tenantId": "t7", "exp": 4_000_000_000}, kid="new")
    # first fetch serves the pre-rotation document; the unknown kid forces
    # exactly one refetch, after which the token verifies
    assert auth.authorize(tok).tenant_id == "t7"
    assert len(calls) == 2


def test_cached_authorizer_allow_never_outlives_exp():
    import pytest

    from aws_saas_factory_multi_tenant_data_pipeline_spark.tenancy import (
        CachedAuthorizer,
        TenantError,
    )

    clock = _Clock(1_000_000.0)
    auth = CachedAuthorizer(
        "https://pool/jwks.json", decision_ttl=300, fetch=lambda u: _jwks(), clock=clock
    )
    tok = _sign_rs256({"custom:tenantId": "t9", "exp": int(clock.t) + 10})
    assert auth.authorize(tok).tenant_id == "t9"
    # 11 s later the token is expired; a naive 5-min decision cache would
    # still allow it (API Gateway does) — this authorizer re-verifies
    clock.t += 11
    with pytest.raises(TenantError, match="expired"):
        auth.authorize(tok)


def test_tier_claim_carried_and_validated():
    import pytest

    from aws_saas_factory_multi_tenant_data_pipeline_spark.tenancy import (
        TenantContext,
        TenantError,
        from_claims,
    )

    # the reference's signup sets custom:tier=Basic (create-user.sh:16);
    # the claim rides along as policy input, optional and validated
    ctx = from_claims({"custom:tenantId": "t1", "custom:tier": "Basic"})
    assert ctx.tenant_id == "t1" and ctx.tier == "Basic"
    assert from_claims({"custom:tenantId": "t1"}).tier is None
    with pytest.raises(TenantError, match="invalid tier"):
        TenantContext(tenant_id="t1", tier="ba d/tier")
