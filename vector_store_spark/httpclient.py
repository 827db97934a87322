"""Resilient HTTP client: the batch analogue of the reference's HA /
reconnect / timeout client semantics.

The reference validates these behaviors live-cluster-side
(`crates/validator/src/high_availability.rs`: a node is configured with
primary and secondary vector-store URIs and requests keep answering when the
primary is down; `reconnect.rs`: a dropped connection is re-established and
in-flight work like full scans completes; `connection_timeout.rs` /
`db_timeout.rs`: an unreachable peer fails the session create within the
configured timeout and a failure counter increments, then service recovers
when connectivity returns). This module re-expresses the client half of
those contracts for anything that talks to the serving tier (httpserver.py)
or an external index backend (sources/opensearch.py):

- **URI failover order**: primary first, then secondaries, mirroring
  `ScyllaNodeConfig.primary_vs_uris` / `secondary_vs_uris` — a request only
  fails after EVERY uri refused.
- **Reconnect with backoff**: transport-level failures (refused, reset,
  timeout) are retried up to ``max_retries`` rounds with exponential
  backoff; a re-established listener on the same address is picked up
  transparently (urllib opens a fresh connection per request, which is the
  stdlib twin of the driver's reconnect).
- **Timeouts + counters**: ``connection_timeout`` bounds each attempt;
  every transport failure increments ``transport_failures`` (the
  session-create-failure counter the reference asserts on) and every
  recovery-after-failure increments ``reconnects``.

HTTP *status* errors (4xx/5xx) are application responses, NOT transport
failures — they return immediately and are never retried (a 503
INDEX_BUILDING must reach the caller, not burn the retry budget)."""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request

__all__ = ["ResilientClient", "TransportError"]


class TransportError(ConnectionError):
    """Raised when every uri refused across every retry round."""


class ResilientClient:
    """Failover + reconnect + timeout semantics over stdlib urllib.

    ``uris`` is the primary-then-secondaries order; ``request`` walks it in
    order per round, so the primary is always preferred when healthy."""

    def __init__(self, uris, connection_timeout: float = 5.0,
                 max_retries: int = 3, backoff_base: float = 0.1):
        if not uris:
            raise ValueError("at least one uri required")
        self.uris = [u.rstrip("/") for u in uris]
        self.connection_timeout = connection_timeout
        self.max_retries = max_retries
        self.backoff_base = backoff_base
        self.transport_failures = 0
        self.reconnects = 0
        self._had_failure = False

    def request(self, method: str, path: str, body: dict | None = None
                ) -> tuple[int, dict]:
        """One logical request; returns (status, parsed-json body).
        4xx/5xx come back as (status, body) without retrying."""
        data = None if body is None else json.dumps(body).encode("utf-8")
        return self.request_raw(method, path, data)

    def request_raw(self, method: str, path: str, data: bytes | None,
                    content_type: str = "application/json"
                    ) -> tuple[int, dict]:
        """Like :meth:`request` but with a pre-encoded body (e.g. NDJSON
        bulk payloads) — the variant executor-side ingest uses. Retried
        bodies must be idempotent on the receiving side."""
        last_err: Exception | None = None
        for attempt in range(self.max_retries + 1):
            for uri in self.uris:
                req = urllib.request.Request(
                    uri + path, data=data, method=method,
                    headers={"Content-Type": content_type})
                try:
                    with urllib.request.urlopen(
                            req, timeout=self.connection_timeout) as r:
                        payload = json.loads(r.read() or b"null")
                        if self._had_failure:
                            self.reconnects += 1
                            self._had_failure = False
                        return r.status, payload
                except urllib.error.HTTPError as err:
                    # application-level response: surface it, never retry
                    raw = err.read()
                    try:
                        payload = json.loads(raw) if raw else {}
                    except json.JSONDecodeError:
                        payload = {"error": raw.decode("utf-8", "replace")}
                    if self._had_failure:
                        self.reconnects += 1
                        self._had_failure = False
                    return err.code, payload
                except (urllib.error.URLError, ConnectionError,
                        TimeoutError, OSError) as err:
                    # transport failure: count it, try the next uri
                    self.transport_failures += 1
                    self._had_failure = True
                    last_err = err
            if attempt < self.max_retries:
                time.sleep(self.backoff_base * (2 ** attempt))
        raise TransportError(
            f"all uris unreachable after {self.max_retries + 1} rounds: "
            f"{self.uris} ({last_err})")

    def get(self, path: str) -> tuple[int, dict]:
        return self.request("GET", path)

    def post(self, path: str, body: dict) -> tuple[int, dict]:
        return self.request("POST", path, body)
