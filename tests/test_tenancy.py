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
