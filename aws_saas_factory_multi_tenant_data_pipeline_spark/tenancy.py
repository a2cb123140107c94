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
    """Authenticated tenant identity (reference claim: ``custom:tenantId``)
    plus the optional SaaS tier (``custom:tier`` — the reference's user
    model carries it from signup, create-user.sh:16 /
    cognito-stack…ts:31, as policy input for tier-dependent quotas; the
    engine's quota/rate-limit operators take it from here, never from
    payload data)."""

    tenant_id: str
    tier: str | None = None

    def __post_init__(self) -> None:
        if not _TENANT_RE.match(self.tenant_id or ""):
            raise TenantError(f"invalid tenant_id: {self.tenant_id!r}")
        if self.tier is not None and not _TENANT_RE.match(self.tier):
            raise TenantError(f"invalid tier: {self.tier!r}")


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
    tier = claims.get("custom:tier")
    return TenantContext(tenant_id=str(tid), tier=str(tier) if tier else None)


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


# ---------------------------------------------------------------------------
# RS256 / JWKS verification (pure stdlib)
# ---------------------------------------------------------------------------

#: ASN.1 DigestInfo prefix for SHA-256 (RFC 8017 §9.2 note 1).
_SHA256_DIGESTINFO = bytes.fromhex("3031300d060960864801650304020105000420")


def _b64url_decode(s: str) -> bytes:
    return base64.urlsafe_b64decode(s + "=" * (-len(s) % 4))


def rs256_verifier(jwks: dict) -> TokenVerifier:
    """Build a ``TokenVerifier`` that checks RS256 signatures against a JWKS.

    The reference authorizer fetches the user pool's JWKS and verifies the
    token's RS256 signature before trusting any claim
    (lambda_authorizer/app.py:50-59). This is the same check implemented
    from the public RFCs with the stdlib only — RSASSA-PKCS1-v1_5 verify
    (RFC 8017 §8.2.2) is one modular exponentiation plus a deterministic
    EMSA-PKCS1-v1_5 padding comparison, so no JOSE/crypto dependency is
    needed:

      1. select the JWK by the header ``kid`` (RFC 7515 §4.1.4),
      2. RSAVP1: ``m = sig^e mod n`` (RFC 8017 §5.2.2),
      3. compare the encoded message against
         ``0x00 0x01 FF… 0x00 || DigestInfo(SHA-256) || SHA-256(input)``
         with a constant-time comparison (RFC 8017 §9.2).

    Expiry/tenant extraction stay in :func:`from_claims` (authorizer
    parity, app.py:63-67). Raises :class:`TenantError` on any mismatch.
    """
    keys = {}
    for k in jwks.get("keys", []):
        if k.get("kty") == "RSA" and k.get("n") and k.get("e"):
            keys[k.get("kid")] = (
                int.from_bytes(_b64url_decode(k["n"]), "big"),
                int.from_bytes(_b64url_decode(k["e"]), "big"),
            )
    if not keys:
        raise TenantError("JWKS contains no usable RSA keys")

    def verify(token: str) -> dict:
        import hashlib
        import hmac

        try:
            header_b64, payload_b64, sig_b64 = token.split(".")
            header = json.loads(_b64url_decode(header_b64))
            sig = _b64url_decode(sig_b64)
        except Exception as e:
            raise TenantError(f"malformed token: {e}") from e
        if header.get("alg") != "RS256":
            # never accept alg=none / HS256-with-public-key downgrades
            raise TenantError(f"unsupported alg: {header.get('alg')!r}")
        kid = header.get("kid")
        if kid in keys:
            n, e = keys[kid]
        elif kid is None and len(keys) == 1:
            n, e = next(iter(keys.values()))
        else:
            raise TenantError(f"no JWKS key for kid {kid!r}")
        k = (n.bit_length() + 7) // 8
        if len(sig) != k:
            raise TenantError("bad signature length")
        em = pow(int.from_bytes(sig, "big"), e, n).to_bytes(k, "big")
        t = _SHA256_DIGESTINFO + hashlib.sha256(
            f"{header_b64}.{payload_b64}".encode("ascii")
        ).digest()
        ps_len = k - 3 - len(t)
        if ps_len < 8:  # RFC 8017 §9.2 step 3: modulus too small
            raise TenantError("modulus too small for RS256")
        expected = b"\x00\x01" + b"\xff" * ps_len + b"\x00" + t
        if not hmac.compare_digest(em, expected):
            raise TenantError("signature verification failed")
        return json.loads(_b64url_decode(payload_b64))

    return verify


# ---------------------------------------------------------------------------
# JWKS retrieval + decision caching (the last piece of A9 parity)
# ---------------------------------------------------------------------------


class CachedAuthorizer:
    """JWKS-fetching, decision-caching authorizer.

    The reference authorizer fetches the user pool's JWKS document over
    HTTPS once per container (lambda_authorizer/app.py:24,34-36) and API
    Gateway caches the resulting allow/deny decision for 5 minutes
    (apigateway-stack.ts:57-62, ``resultsCacheTtl``). This class carries
    both behaviors into the engine:

    - **JWKS fetch**: ``jwks_url`` is read with ``urllib`` (https:// in a
      real deployment; file:// in offline tests) and the parsed document
      is reused for ``jwks_ttl`` seconds. An unknown ``kid`` forces ONE
      immediate refetch before failing — the key-rotation path: a freshly
      rotated pool key becomes valid without waiting out the TTL.
    - **Decision cache**: each token's verdict (the TenantContext, or the
      TenantError) is cached for ``decision_ttl`` seconds keyed by the
      token's SHA-256 — raw tokens are never stored. Allow entries are
      additionally capped at the token's own ``exp`` (strictly safer than
      API Gateway, which serves a cached allow past expiry for up to the
      TTL). Deny entries cache for the full TTL, same as API Gateway.

    ``fetch``/``clock`` are injectable for tests; thread-safe for use
    from a multi-threaded driver.
    """

    def __init__(
        self,
        jwks_url: str,
        decision_ttl: float = 300.0,
        jwks_ttl: float = 3600.0,
        max_entries: int = 10_000,
        fetch: Callable[[str], dict] | None = None,
        clock: Callable[[], float] | None = None,
    ) -> None:
        import threading
        import time

        self._jwks_url = jwks_url
        self._decision_ttl = float(decision_ttl)
        self._jwks_ttl = float(jwks_ttl)
        self._max_entries = int(max_entries)
        self._fetch = fetch if fetch is not None else self._urllib_fetch
        self._clock = clock if clock is not None else time.time
        self._lock = threading.Lock()
        self._verifier: TokenVerifier | None = None
        self._jwks_fetched_at = float("-inf")
        self._decisions: dict[str, tuple[float, TenantContext | TenantError]] = {}
        self.fetch_count = 0  # observable: JWKS round-trips actually made

    @staticmethod
    def _urllib_fetch(url: str) -> dict:
        from urllib.request import urlopen

        with urlopen(url, timeout=10) as resp:  # noqa: S310 — caller-supplied URL
            return json.loads(resp.read().decode("utf-8"))

    def _verifier_fresh(self, now: float, force: bool = False) -> TokenVerifier:
        # caller holds the lock
        if (
            force
            or self._verifier is None
            or now - self._jwks_fetched_at >= self._jwks_ttl
        ):
            self._verifier = rs256_verifier(self._fetch(self._jwks_url))
            self._jwks_fetched_at = now
            self.fetch_count += 1
        return self._verifier

    def _prune(self, now: float) -> None:
        # caller holds the lock; drop expired entries, then cap size FIFO
        if len(self._decisions) > self._max_entries:
            self._decisions = {
                k: v for k, v in self._decisions.items() if v[0] > now
            }
            while len(self._decisions) > self._max_entries:
                self._decisions.pop(next(iter(self._decisions)))

    def authorize(self, token: str) -> TenantContext:
        """Verify ``token`` (signature → expiry → tenant claim) with the
        decision cache in front; returns the TenantContext or raises the
        (possibly cached) TenantError."""
        import hashlib

        now = self._clock()
        key = hashlib.sha256(token.encode("utf-8")).hexdigest()
        with self._lock:
            hit = self._decisions.get(key)
            if hit is not None and hit[0] > now:
                if isinstance(hit[1], TenantError):
                    raise hit[1]
                return hit[1]
            verifier = self._verifier_fresh(now)
        expires = now + self._decision_ttl
        try:
            try:
                claims = verifier(token)
            except TenantError as e:
                # rotation path: an unknown kid may mean a fresh pool key —
                # refetch once and retry before denying
                if "no JWKS key for kid" not in str(e):
                    raise
                with self._lock:
                    verifier = self._verifier_fresh(self._clock(), force=True)
                claims = verifier(token)
            ctx = from_claims(claims, now_epoch=int(now))
        except TenantError as deny:
            with self._lock:
                self._decisions[key] = (expires, deny)
                self._prune(now)
            raise
        except Exception as e:  # verifier bug / malformed JWKS
            raise TenantError(f"token verification failed: {e}") from e
        exp = claims.get("exp")
        if exp is not None:
            expires = min(expires, float(exp))
        with self._lock:
            self._decisions[key] = (expires, ctx)
            self._prune(now)
        return ctx
