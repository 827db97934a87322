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

#: humantime's unit grammar (humantime::parse_duration, the parser the
#: reference feeds VECTOR_STORE_TLS_FILE_CHECK_INTERVAL through): every
#: alias the crate accepts, longest-first so ``ms`` wins over ``m``+junk.
_DURATION_UNITS = {
    "nsec": 1e-9, "ns": 1e-9,
    "usec": 1e-6, "us": 1e-6,
    "msec": 0.001, "ms": 0.001,
    "seconds": 1.0, "second": 1.0, "secs": 1.0, "sec": 1.0, "s": 1.0,
    "minutes": 60.0, "minute": 60.0, "mins": 60.0, "min": 60.0, "m": 60.0,
    "hours": 3600.0, "hour": 3600.0, "hr": 3600.0, "h": 3600.0,
    "days": 86400.0, "day": 86400.0, "d": 86400.0,
    "weeks": 604800.0, "week": 604800.0, "w": 604800.0,
    "months": 2630016.0, "month": 2630016.0, "M": 2630016.0,  # 30.44 d
    "years": 31557600.0, "year": 31557600.0, "y": 31557600.0,  # 365.25 d
}


def parse_humantime(raw: str) -> Optional[float]:
    """humantime-compatible duration parse -> seconds, or None on failure.

    Accepts single (``30s``, ``5min``, ``2days``) and compound
    (``1m 30s``, ``1h30m``) durations; units are required (a bare number is
    an error, as in the crate). Case-sensitive like humantime (``M`` =
    months, ``m`` = minutes)."""
    import re

    s = raw.strip()
    if not s:
        return None
    alts = "|".join(sorted(_DURATION_UNITS, key=len, reverse=True))
    tokens = re.findall(rf"(\d+(?:\.\d+)?)\s*({alts})\s*", s)
    # re-join what the token scan consumed; any residue = parse failure
    consumed = re.fullmatch(rf"(?:\s*\d+(?:\.\d+)?\s*(?:{alts})\s*)+", s)
    if not tokens or consumed is None:
        return None
    return sum(float(n) * _DURATION_UNITS[u] for n, u in tokens)


def tls_file_check_interval(env: Callable[[str], Optional[str]] = os.environ.get) -> float:
    """config_manager.rs:25-39: the TLS cert re-check cadence in seconds.

    Parses full humantime durations (``500ms`` / ``30s`` / ``5min`` /
    ``2days`` / compound ``1m 30s``) — the reference hands the raw string
    to humantime::parse_duration, so every unit alias it accepts must keep
    its intended cadence here. UNLIKE every other VECTOR_STORE_* env, a
    present-but-invalid value does NOT error — the reference logs a warning
    and falls back to the 30 s default (the one lenient parse in its config
    surface); mirrored exactly."""
    raw = env("VECTOR_STORE_TLS_FILE_CHECK_INTERVAL")
    if not raw:
        return DEFAULT_TLS_FILE_CHECK_INTERVAL
    parsed = parse_humantime(raw)
    if parsed is None:
        log.warning(
            "Failed to parse VECTOR_STORE_TLS_FILE_CHECK_INTERVAL=%r. "
            "Using default %ss", raw, DEFAULT_TLS_FILE_CHECK_INTERVAL,
        )
        return DEFAULT_TLS_FILE_CHECK_INTERVAL
    return parsed


class FileMonitor:
    """file_monitor.rs:17-48: change detection by CONTENT hash (mtime alone
    misses in-place rewrites that restore the timestamp, the failure mode the
    reference built this for — TLS certs rotated by config management).

    Accepts one path or a SET of paths (tls_reload.rs watches the whole TLS
    file set — cert AND key — so a key-only rotation still triggers): the
    hash covers every file's content in order, with per-file framing so a
    byte moving between files can't collide."""

    def __init__(self, *paths: Optional[str]):
        self.paths = tuple(p for p in paths if p is not None)
        self.last_content_hash = self._read_content_hash(self.paths)

    @staticmethod
    def _read_content_hash(paths) -> Optional[str]:
        if isinstance(paths, str):
            paths = (paths,)
        if not paths:
            return None
        h = hashlib.sha256()
        for path in paths:
            try:
                with open(path, "rb") as f:
                    content = f.read()
            except OSError:
                content = b""
            h.update(len(content).to_bytes(8, "big"))
            h.update(content)
        return h.hexdigest()

    def update(self, *paths: Optional[str]) -> None:
        if paths:
            self.paths = tuple(p for p in paths if p is not None)
        self.last_content_hash = self._read_content_hash(self.paths)

    def has_changes(self) -> bool:
        return self._read_content_hash(self.paths) != self.last_content_hash


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
    _file_watchers: list = field(default_factory=list)
    _watch_stop: Optional[threading.Event] = None
    _watch_thread: Optional[threading.Thread] = None

    def subscribe(self, callback: Callable[[Config], None]) -> None:
        with self._lock:
            self._subscribers.append(callback)

    # -- unified watch loop (config_manager.rs:25-39): ONE poll cadence
    # drives every file watcher (the TLS cert/key check subscribes here like
    # any other), and a SIGHUP fires the same tick alongside the reload —
    # the reference's single watch loop rather than per-component pollers.

    def add_file_watcher(self, fn: Callable[[], object]) -> None:
        """Register a per-tick callable (e.g. TlsReloader.check_and_reload).
        Exceptions are logged and the loop keeps running — a mid-rotation
        TLS state must not kill the watch thread."""
        with self._lock:
            self._file_watchers.append(fn)

    def tick(self) -> None:
        """Run every registered file watcher once, exception-guarded."""
        with self._lock:
            watchers = list(self._file_watchers)
        for fn in watchers:
            try:
                fn()
            except Exception as exc:  # noqa: BLE001 — keep the loop alive
                log.warning("config watch tick failed (will retry): %s", exc)

    def start_watch(self, interval: Optional[float] = None,
                    env: Callable[[str], Optional[str]] = os.environ.get
                    ) -> float:
        """Start the single watch loop at the TLS-file-check cadence
        (VECTOR_STORE_TLS_FILE_CHECK_INTERVAL, default 30 s). Returns the
        effective interval."""
        if interval is None:
            interval = tls_file_check_interval(env)
        self._watch_stop = threading.Event()

        def _loop():
            while not self._watch_stop.wait(interval):
                self.tick()

        self._watch_thread = threading.Thread(target=_loop, daemon=True)
        self._watch_thread.start()
        return interval

    def stop_watch(self) -> None:
        if self._watch_stop is not None:
            self._watch_stop.set()
            self._watch_thread.join(timeout=10)
            self._watch_stop = None
            self._watch_thread = None

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
        """SIGHUP -> reload + watch tick (config_manager.rs:247-260): one
        signal drives BOTH halves of the watch fan-out — the env-config
        reload and every registered file watcher (TLS rotation included),
        the reference's single-lifecycle semantics. Returns False where
        signals are unavailable (non-main thread / non-unix)."""
        import signal

        def _on_hup(*_):
            self.reload(env)
            self.tick()

        try:
            signal.signal(signal.SIGHUP, _on_hup)
            return True
        except (ValueError, AttributeError, OSError):
            return False
