"""Dynamic configuration: env-var loading, hot reload, file monitoring.

The reference keeps its runtime configuration in a ConfigManager that (1)
loads every ``VECTOR_STORE_*`` env var with strict parse validation
(config_manager.rs:370-520), (2) reloads on SIGHUP and fans the new config
out over watch channels (config_manager.rs:154-260), (3) warns — but stores —
changes that need a restart (threads, log coloring), and (4) detects
in-place file content changes by content hash (file_monitor.rs:17-48). The
engine factory then selects the backend from the loaded config: an
OpenSearch address wins, else the DiskANN flag, else USearch (lib.rs:766-775).

This module re-expresses that lifecycle for the Spark engine: the same env
names, the same validation failures, the same reload/notify/restart-warning
split, and the same backend-selection rule mapped onto our strategy axis
(engine.ANN_STRATEGIES). Watchers are plain callbacks — the batch engine has
no actor runtime; subscribers are driver-side components (e.g. a
MemoryWatcher rebuilt with the new limit, an HTTP server re-reading
defaults)."""

from __future__ import annotations

import hashlib
import logging
import os
import threading
from dataclasses import dataclass, field, replace
from typing import Callable, Optional

log = logging.getLogger(__name__)


@dataclass
class Config:
    """The subset of the reference Config with a batch analogue
    (config_manager.rs:60-110). Addresses stay opaque strings."""

    vector_store_addr: str = "127.0.0.1:6080"
    scylladb_uri: str = "127.0.0.1:9042"
    threads: Optional[int] = None
    memory_limit: Optional[int] = None
    memory_usage_check_interval: Optional[float] = None
    opensearch_addr: Optional[str] = None
    use_diskann: bool = False
    diskann_alpha: Optional[float] = None
    fulltext_indexes: bool = False
    disable_colors: bool = False


def _parse_bool(raw: str, name: str) -> bool:
    if raw in ("true", "false"):
        return raw == "true"
    raise ValueError(f"Unable to parse {name} env (true/false)")


def load_config(env: Callable[[str], Optional[str]] = os.environ.get) -> Config:
    """config_manager.rs:370-520: each env is optional, but a PRESENT env
    that fails to parse is an error, never silently defaulted."""
    config = Config()
    raw = env("VECTOR_STORE_URI")
    if raw:
        if ":" not in raw:
            raise ValueError("Unable to parse VECTOR_STORE_URI env (host:port)")
        config.vector_store_addr = raw
    raw = env("VECTOR_STORE_SCYLLADB_URI")
    if raw:
        config.scylladb_uri = raw
    raw = env("VECTOR_STORE_THREADS")
    if raw:
        config.threads = int(raw)
    raw = env("VECTOR_STORE_MEMORY_LIMIT")
    if raw:
        config.memory_limit = int(raw)
    raw = env("VECTOR_STORE_MEMORY_USAGE_CHECK_INTERVAL")
    if raw:
        config.memory_usage_check_interval = float(raw)
    raw = env("VECTOR_STORE_OPENSEARCH_URI")
    if raw:
        config.opensearch_addr = raw
    raw = env("VECTOR_STORE_USE_DISKANN")
    if raw:
        config.use_diskann = _parse_bool(raw, "VECTOR_STORE_USE_DISKANN")
    raw = env("VECTOR_STORE_DISKANN_ALPHA")
    if raw:
        alpha = float(raw)
        # lib.rs:161-168: alpha must be finite and > 0
        if not (alpha > 0.0) or alpha != alpha or alpha in (float("inf"),):
            raise ValueError(f"Invalid VECTOR_STORE_DISKANN_ALPHA: {raw}")
        config.diskann_alpha = alpha
    raw = env("VECTOR_STORE_FULLTEXT_INDEXES")
    if raw:
        config.fulltext_indexes = _parse_bool(raw, "VECTOR_STORE_FULLTEXT_INDEXES")
    raw = env("VECTOR_STORE_DISABLE_COLORS")
    if raw:
        config.disable_colors = _parse_bool(raw, "VECTOR_STORE_DISABLE_COLORS")
    return config


def select_engine_strategy(config: Config) -> str:
    """The backend factory selection (lib.rs:766-775): an OpenSearch address
    wins, else the DiskANN flag, else the USearch default — mapped onto the
    strategy axis."""
    if config.opensearch_addr:
        return "opensearch"
    if config.use_diskann:
        return "diskann"
    return "hnsw"


#: config_manager.rs:22
DEFAULT_TLS_FILE_CHECK_INTERVAL = 30.0

_DURATION_UNITS = {"ms": 0.001, "s": 1.0, "m": 60.0, "h": 3600.0}


def tls_file_check_interval(env: Callable[[str], Optional[str]] = os.environ.get) -> float:
    """config_manager.rs:25-39: the TLS cert re-check cadence in seconds.

    Parses humantime-style durations (``500ms`` / ``30s`` / ``5m`` / ``1h``).
    UNLIKE every other VECTOR_STORE_* env, a present-but-invalid value here
    does NOT error — the reference logs a warning and falls back to the 30 s
    default (the one lenient parse in its config surface); mirrored
    exactly."""
    raw = env("VECTOR_STORE_TLS_FILE_CHECK_INTERVAL")
    if not raw:
        return DEFAULT_TLS_FILE_CHECK_INTERVAL
    import re

    m = re.fullmatch(r"(\d+(?:\.\d+)?)(ms|s|m|h)", raw.strip())
    if m is None:
        log.warning(
            "Failed to parse VECTOR_STORE_TLS_FILE_CHECK_INTERVAL=%r. "
            "Using default %ss", raw, DEFAULT_TLS_FILE_CHECK_INTERVAL,
        )
        return DEFAULT_TLS_FILE_CHECK_INTERVAL
    return float(m.group(1)) * _DURATION_UNITS[m.group(2)]


class FileMonitor:
    """file_monitor.rs:17-48: change detection by CONTENT hash (mtime alone
    misses in-place rewrites that restore the timestamp, the failure mode the
    reference built this for — TLS certs rotated by config management)."""

    def __init__(self, path: Optional[str] = None):
        self.path = path
        self.last_content_hash = self._read_content_hash(path)

    @staticmethod
    def _read_content_hash(path: Optional[str]) -> Optional[str]:
        if path is None:
            return None
        try:
            with open(path, "rb") as f:
                return hashlib.sha256(f.read()).hexdigest()
        except OSError:
            return None

    def update(self, path: Optional[str]) -> None:
        self.path = path
        self.last_content_hash = self._read_content_hash(path)

    def has_changes(self) -> bool:
        return self._read_content_hash(self.path) != self.last_content_hash


#: changes that take effect only after a restart (config_manager.rs:207-245)
_RESTART_REQUIRED_FIELDS = ("disable_colors", "threads")


@dataclass
class ConfigManager:
    """Hot-reloadable config holder (config_manager.rs:111-260).

    ``subscribe(cb)`` registers a callback invoked with the new Config on
    every successful reload — the watch-channel analogue. ``reload(env)``
    loads fresh, warns on restart-required diffs, stores, notifies. A parse
    failure leaves the OLD config in place (the reference's reload_config
    propagates the error without sending)."""

    config: Config = field(default_factory=load_config)
    _subscribers: list = field(default_factory=list)
    _lock: threading.Lock = field(default_factory=threading.Lock)

    def subscribe(self, callback: Callable[[Config], None]) -> None:
        with self._lock:
            self._subscribers.append(callback)

    def current(self) -> Config:
        with self._lock:
            return replace(self.config)

    def reload(self, env: Callable[[str], Optional[str]] = os.environ.get) -> Config:
        new_config = load_config(env)  # raises -> old config survives
        with self._lock:
            old = self.config
            changes = [
                f"{name}: {getattr(old, name)!r} -> {getattr(new_config, name)!r}"
                for name in _RESTART_REQUIRED_FIELDS
                if getattr(old, name) != getattr(new_config, name)
            ]
            self.config = new_config
            subscribers = list(self._subscribers)
        if changes:
            log.warning(
                "Configuration changes detected that require server restart:\n  %s\n"
                "These changes have been stored but will not take effect until "
                "the server is restarted.", "\n  ".join(changes),
            )
        for cb in subscribers:
            cb(new_config)
        return new_config

    def install_sighup(self, env: Callable[[str], Optional[str]] = os.environ.get) -> bool:
        """SIGHUP -> reload (config_manager.rs:247-260). Returns False where
        signals are unavailable (non-main thread / non-unix)."""
        import signal

        try:
            signal.signal(signal.SIGHUP, lambda *_: self.reload(env))
            return True
        except (ValueError, AttributeError, OSError):
            return False
