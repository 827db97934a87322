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
