"""TenantContext unit tests (A9 parity: claim extraction + expiry)."""

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
