"""Tenant context — the engine-side stand-in for the reference's authorizer.

In the reference, tenant identity is never client data: it is extracted from
the verified JWT (lambda_authorizer/app.py:20-21,57-67) and injected
server-side as the Kinesis partition key (apigateway-stack.ts:124-127).
The Spark engine keeps the same invariant by making every ingest/query API
take a ``TenantContext`` produced by the caller's auth layer — the payload
never supplies the tenant id. JWT verification itself is out of Spark scope
and pluggable here.
"""

from __future__ import annotations

import base64
import json
import re
from collections.abc import Callable
from dataclasses import dataclass

_TENANT_RE = re.compile(r"^[A-Za-z0-9_\-]{1,64}$")

#: Signature-verification hook: (token) -> claims dict, raising on any
#: invalid signature/issuer/audience. The reference does RS256 against the
#: pool's JWKS (lambda_authorizer/app.py:50-59); a real deployment plugs a
#: JOSE library in here. No default implementation is provided on purpose —
#: an unverified default would silently trust forged tokens.
TokenVerifier = Callable[[str], dict]


class TenantError(ValueError):
    """Raised for missing/malformed tenant identity."""


@dataclass(frozen=True)
class TenantContext:
    """Authenticated tenant identity (reference claim: ``custom:tenantId``)."""

    tenant_id: str

    def __post_init__(self) -> None:
        if not _TENANT_RE.match(self.tenant_id or ""):
            raise TenantError(f"invalid tenant_id: {self.tenant_id!r}")


def from_claims(claims: dict, now_epoch: int | None = None) -> TenantContext:
    """Extract tenant from a (pre-verified) claims dict, as app.py:20-21 does.

    Mirrors the authorizer's expiry check (app.py:63-67): an ``exp`` claim
    in the past rejects the context. Signature verification itself stays
    pluggable (out of Spark scope).
    """
    exp = claims.get("exp")
    if exp is not None:
        import time

        now = now_epoch if now_epoch is not None else int(time.time())
        if int(exp) < now:
            raise TenantError("token expired")
    tid = claims.get("custom:tenantId")
    if not tid:
        raise TenantError("missing custom:tenantId claim")
    return TenantContext(tenant_id=str(tid))


def unverified_claims(token: str) -> dict:
    """Decode a JWT payload WITHOUT verifying the signature.

    Exists so ``from_token`` can be exercised/tested without a JOSE
    dependency; never use as the ``verifier`` in production — it trusts
    whatever the client sent (the reference always verifies first,
    app.py:50-59).
    """
    try:
        payload_b64 = token.split(".")[1]
        payload_b64 += "=" * (-len(payload_b64) % 4)
        return json.loads(base64.urlsafe_b64decode(payload_b64))
    except Exception as e:  # malformed structure/base64/json
        raise TenantError(f"malformed token: {e}") from e


def from_token(
    token: str, verifier: TokenVerifier, now_epoch: int | None = None
) -> TenantContext:
    """Full authorizer parity: verify signature → extract claims → expiry
    check → tenant extraction (lambda_authorizer/app.py:50-67).

    ``verifier`` is the pluggable signature-verification hook
    (``TokenVerifier``); any exception it raises is surfaced as a
    ``TenantError`` (the authorizer's 401 path).
    """
    try:
        claims = verifier(token)
    except TenantError:
        raise
    except Exception as e:
        raise TenantError(f"token verification failed: {e}") from e
    return from_claims(claims, now_epoch=now_epoch)
