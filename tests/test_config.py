"""Dynamic config lifecycle (plans/config.py re-expressing
config_manager.rs + file_monitor.rs): env loading with strict validation,
hot reload + notify, restart-required warnings, content-hash file
monitoring, and the backend factory selection rule."""

import os
import signal

import pytest

from vector_store_spark.plans.config import (
    Config,
    ConfigManager,
    FileMonitor,
    load_config,
    select_engine_strategy,
)


def _env(d):
    return lambda name: d.get(name)


def test_defaults_when_unset():
    c = load_config(_env({}))
    assert c.threads is None and c.memory_limit is None
    assert c.opensearch_addr is None and c.use_diskann is False
    assert c.fulltext_indexes is False


def test_env_parsing_happy_path():
    c = load_config(_env({
        "VECTOR_STORE_URI": "0.0.0.0:7080",
        "VECTOR_STORE_THREADS": "16",
        "VECTOR_STORE_MEMORY_LIMIT": "1073741824",
        "VECTOR_STORE_MEMORY_USAGE_CHECK_INTERVAL": "2.5",
        "VECTOR_STORE_OPENSEARCH_URI": "http://os:9200",
        "VECTOR_STORE_USE_DISKANN": "true",
        "VECTOR_STORE_DISKANN_ALPHA": "1.2",
        "VECTOR_STORE_FULLTEXT_INDEXES": "true",
        "VECTOR_STORE_DISABLE_COLORS": "false",
    }))
    assert c.vector_store_addr == "0.0.0.0:7080"
    assert c.threads == 16 and c.memory_limit == 2**30
    assert c.memory_usage_check_interval == 2.5
    assert c.opensearch_addr == "http://os:9200"
    assert c.use_diskann is True and c.diskann_alpha == 1.2
    assert c.fulltext_indexes is True


@pytest.mark.parametrize("name,value", [
    ("VECTOR_STORE_URI", "noport"),
    ("VECTOR_STORE_THREADS", "many"),
    ("VECTOR_STORE_USE_DISKANN", "yes"),      # strict true/false
    ("VECTOR_STORE_DISKANN_ALPHA", "0"),      # lib.rs:161-168: > 0
    ("VECTOR_STORE_DISKANN_ALPHA", "nan"),
    ("VECTOR_STORE_FULLTEXT_INDEXES", "1"),
])
def test_present_but_invalid_env_is_an_error(name, value):
    with pytest.raises(ValueError):
        load_config(_env({name: value}))


def test_backend_selection_rule():
    # lib.rs:766-775: opensearch_addr wins, then use_diskann, then usearch
    assert select_engine_strategy(Config()) == "hnsw"
    assert select_engine_strategy(Config(use_diskann=True)) == "diskann"
    assert select_engine_strategy(
        Config(use_diskann=True, opensearch_addr="http://os:9200")
    ) == "opensearch"


def test_reload_notifies_subscribers_and_keeps_old_on_error():
    mgr = ConfigManager(config=load_config(_env({})))
    seen = []
    mgr.subscribe(seen.append)
    mgr.reload(_env({"VECTOR_STORE_MEMORY_LIMIT": "1048576"}))
    assert seen and seen[-1].memory_limit == 1048576
    assert mgr.current().memory_limit == 1048576
    # a failing reload leaves the stored config untouched and notifies nobody
    with pytest.raises(ValueError):
        mgr.reload(_env({"VECTOR_STORE_USE_DISKANN": "bogus"}))
    assert mgr.current().memory_limit == 1048576
    assert len(seen) == 1


def test_restart_required_changes_warn_but_store(caplog):
    mgr = ConfigManager(config=load_config(_env({})))
    with caplog.at_level("WARNING"):
        mgr.reload(_env({"VECTOR_STORE_THREADS": "8"}))
    assert mgr.current().threads == 8
    assert any("require server restart" in r.message for r in caplog.records)


def test_sighup_triggers_reload():
    mgr = ConfigManager(config=load_config(_env({})))
    assert mgr.install_sighup(
        _env({"VECTOR_STORE_FULLTEXT_INDEXES": "true"})) is True
    try:
        os.kill(os.getpid(), signal.SIGHUP)
        assert mgr.current().fulltext_indexes is True
    finally:
        signal.signal(signal.SIGHUP, signal.SIG_DFL)


def test_file_monitor_content_hash(tmp_path):
    p = tmp_path / "cert.pem"
    p.write_bytes(b"cert-v1")
    mon = FileMonitor(str(p))
    assert mon.has_changes() is False
    # in-place rewrite with same size: caught by CONTENT hash
    p.write_bytes(b"cert-v2")
    assert mon.has_changes() is True
    mon.update(str(p))
    assert mon.has_changes() is False
    # deletion is a change; None path is stable
    p.unlink()
    assert mon.has_changes() is True
    mon.update(None)
    assert mon.has_changes() is False


def test_reload_flips_backend_under_live_server(spark, sf_dir):
    """End-to-end watch fan-out (config_manager.rs:154-260 + lib.rs:766-775):
    an opensearch_addr appearing at runtime — delivered via SIGHUP — flips
    select_engine_strategy for the NEXT registered index while the HTTP
    server keeps serving uninterrupted 200s, and the newly registered index
    actually serves through the new backend (score-valued distances)."""
    import json
    import threading
    import urllib.request

    from vector_store_spark.engine import VectorStoreEngine
    from vector_store_spark.httpserver import serve
    from vector_store_spark.registry import det_query_vector
    from vector_store_spark.sources.opensearch import (
        OpenSearchEmulator,
        bulk_bodies,
        create_index_request,
    )
    from vector_store_spark.types import IndexMetadata

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    def _meta(index):
        return IndexMetadata(
            keyspace="ks", index=index, table="embeddings",
            primary_key_columns=("vec_id",), partition_key_count=1,
            target_column="embedding", dimensions=64,
        )

    eng = VectorStoreEngine()
    eng.register(emb, _meta("emb_cfg"), strategy="exact")
    mgr = ConfigManager(config=load_config(_env({})))
    # the factory seam: config -> default strategy for future registrations
    mgr.subscribe(lambda c: setattr(
        eng, "default_strategy", select_engine_strategy(c)))

    srv = serve(eng)
    host, port = srv._httpd.server_address[:2]
    url = f"http://{host}:{port}/api/v1/indexes/ks/emb_cfg/ann"
    q = det_query_vector(5, 64)
    stop = threading.Event()
    statuses, errors = [], []

    def hammer():
        while not stop.is_set():
            try:
                req = urllib.request.Request(
                    url, data=json.dumps({"vector": q, "limit": 2}).encode(),
                    method="POST")
                with urllib.request.urlopen(req, timeout=120) as r:
                    statuses.append(r.status)
            except Exception as ex:  # pragma: no cover
                errors.append(ex)
                return

    t = threading.Thread(target=hammer)
    t.start()
    try:
        # runtime reload via SIGHUP: an OpenSearch address appears
        assert mgr.install_sighup(_env(
            {"VECTOR_STORE_OPENSEARCH_URI": "http://127.0.0.1:9200"})) is True
        before = len(statuses)
        os.kill(os.getpid(), signal.SIGHUP)
        assert eng.default_strategy == "opensearch"
        # the NEXT registered index picks the new backend with no explicit
        # strategy; existing emb_cfg keeps serving exact throughout
        client = OpenSearchEmulator()
        m, p, b = create_index_request("emb_cfg2", 64)
        assert client.request(m, p, b)[0] == 200
        client.ingest_bodies(bulk_bodies(
            emb.limit(64), "vec_id", "embedding", "emb_cfg2",
            batch_size=64).collect())
        eng.register(emb.limit(64), _meta("emb_cfg2"),
                     strategy_opts={"client": client, "index_key": "emb_cfg2"})
        assert eng.indexes["emb_cfg2"].strategy == "opensearch"
        # ...and it serves over the live server through the new backend:
        # cosinesimil scores-as-distances lie in [0.5, 1] for this corpus
        req = urllib.request.Request(
            f"http://{host}:{port}/api/v1/indexes/ks/emb_cfg2/ann",
            data=json.dumps({"vector": q, "limit": 3}).encode(),
            method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            body = json.loads(r.read())
        assert len(body["primary_keys"]["vec_id"]) == 3
        assert all(0.0 <= d <= 2.0 for d in body["distances"])
        # serving never hiccuped across the reload
        while len(statuses) <= before and not errors:
            pass
    finally:
        stop.set()
        t.join(timeout=60)
        srv.stop()
        signal.signal(signal.SIGHUP, signal.SIG_DFL)
    assert not errors
    assert statuses and set(statuses) == {200}


def test_config_feeds_memory_watcher():
    """The reload path re-arms R7 with the configured limit — the
    config->memory wiring the reference runs over watch channels
    (memory.rs:100-118)."""
    from vector_store_spark.operators.admission import MemoryWatcher

    mgr = ConfigManager(config=load_config(_env({})))
    watchers = []
    mgr.subscribe(lambda c: watchers.append(
        MemoryWatcher(config_limit=c.memory_limit,
                      refresh_interval=c.memory_usage_check_interval or 1.0)))
    mgr.reload(_env({"VECTOR_STORE_MEMORY_LIMIT": str(2 * 1024**3)}))
    assert watchers and watchers[-1].memory_limit <= 2 * 1024**3
