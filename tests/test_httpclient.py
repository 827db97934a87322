"""HA / reconnect / timeout client semantics (httpclient.py re-expressing
the behaviors validator's high_availability.rs / reconnect.rs /
connection_timeout.rs assert live-cluster-side) — driven against real
localhost listeners, no Spark session needed."""

import socket
import threading

import pytest

from vector_store_spark.engine import VectorStoreEngine
from vector_store_spark.httpclient import ResilientClient, TransportError
from vector_store_spark.httpserver import VectorStoreHttpServer


def _dead_port():
    """A port with no listener: connections are refused immediately."""
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_failover_primary_down_secondary_answers():
    """high_availability.rs test_secondary_uri_works_correctly: the primary
    uri refuses, the secondary serves — the request answers 200 and the
    primary's failure is counted."""
    srv = VectorStoreHttpServer(VectorStoreEngine())
    _, port = srv.start()
    try:
        c = ResilientClient(
            [f"http://127.0.0.1:{_dead_port()}",      # primary: down
             f"http://127.0.0.1:{port}"],             # secondary: live
            connection_timeout=5, max_retries=0)
        status, body = c.get("/api/v1/info")
        assert status == 200 and "version" in body
        assert c.transport_failures == 1  # the refused primary
    finally:
        srv.stop()


def test_primary_preferred_when_healthy():
    srv = VectorStoreHttpServer(VectorStoreEngine())
    _, port = srv.start()
    try:
        c = ResilientClient([f"http://127.0.0.1:{port}",
                             f"http://127.0.0.1:{_dead_port()}"])
        status, _ = c.get("/api/v1/info")
        assert status == 200
        assert c.transport_failures == 0  # secondary never touched
    finally:
        srv.stop()


def test_all_down_raises_after_counted_retries():
    """connection_timeout.rs: an unreachable peer fails within the timeout
    budget and the failure counter increments — here every (uri, round)
    combination is counted before TransportError."""
    c = ResilientClient(
        [f"http://127.0.0.1:{_dead_port()}", f"http://127.0.0.1:{_dead_port()}"],
        connection_timeout=2, max_retries=2, backoff_base=0.01)
    with pytest.raises(TransportError):
        c.get("/api/v1/info")
    assert c.transport_failures == 6  # 2 uris x 3 rounds


def test_request_timeout_on_unresponsive_listener():
    """A listener that accepts but never responds must trip the per-attempt
    timeout (db_timeout.rs's stalled-peer case), not hang the client."""
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    s.listen(1)
    port = s.getsockname()[1]
    try:
        c = ResilientClient([f"http://127.0.0.1:{port}"],
                            connection_timeout=0.5, max_retries=0)
        with pytest.raises(TransportError):
            c.get("/api/v1/info")
        assert c.transport_failures == 1
    finally:
        s.close()


def test_reconnect_after_listener_restart():
    """reconnect.rs: a restarted peer on the same address is picked up
    transparently and the recovery is counted as a reconnect."""
    srv = VectorStoreHttpServer(VectorStoreEngine())
    _, port = srv.start()
    c = ResilientClient([f"http://127.0.0.1:{port}"],
                        connection_timeout=5, max_retries=4,
                        backoff_base=0.2)
    assert c.get("/api/v1/info")[0] == 200
    srv.stop()
    # while the peer is down, a bounded-retry client fails loudly...
    brief = ResilientClient([f"http://127.0.0.1:{port}"],
                            connection_timeout=1, max_retries=0)
    with pytest.raises(TransportError):
        brief.get("/api/v1/info")
    # ...and the patient client rides its backoff through the restart
    def _restart():
        srv2 = VectorStoreHttpServer(VectorStoreEngine())
        srv2.start(port=port)
        restarted.append(srv2)

    restarted: list = []
    t = threading.Timer(0.5, _restart)
    t.start()
    try:
        status, _ = c.get("/api/v1/info")
        assert status == 200
        assert c.transport_failures >= 1 and c.reconnects == 1
    finally:
        t.cancel()
        for s2 in restarted:
            s2.stop()


def test_http_status_errors_are_not_retried():
    """A 404 is an application response (missing index), not a transport
    failure — it must come back immediately with zero retry burn."""
    srv = VectorStoreHttpServer(VectorStoreEngine())
    _, port = srv.start()
    try:
        c = ResilientClient([f"http://127.0.0.1:{port}"], max_retries=5)
        status, body = c.get("/api/v1/indexes/ks/ghost")
        assert status == 404 and "error" in body
        assert c.transport_failures == 0
    finally:
        srv.stop()
