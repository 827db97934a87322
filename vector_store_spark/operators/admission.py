"""R6/R7/R8 — capacity reservation, memory admission, concurrency modes.

The reference wraps every USearch index in three protective mechanisms; this
module re-expresses them for the batch/streaming maintenance paths of this
engine (the persisted-layout CRUD in operators/ivf.py, operators/hnsw.py and
the CDC sinks), where the same failure classes exist — an add-wave can outgrow
reserved capacity, exhaust executor/driver memory, or race a removal:

- **R6 capacity reservation** (usearch.rs:440-443, 626-670): an index grows in
  fixed increments — 1 000 000 slots for GLOBAL indexes, 1 000 for LOCAL
  per-partition sub-indexes — whenever free capacity falls under the channel
  size (the in-flight message bound). :class:`PartitionCapacity` keeps the
  same size/capacity/increment arithmetic; ``reserve`` must run under an
  exclusive :class:`OperationGate` permit, exactly like
  ``permit_for_reserve`` (usearch.rs:897-917).

- **R7 memory admission** (memory.rs:23-31, 100-170; usearch.rs:1156-1177):
  a watcher refreshes memory info every second; the admission limit is
  ``available − max(1% of RAM, 200 MB)`` (optionally clamped by a configured
  limit), and when used memory crosses it, AddVector/AddDocument operations
  are DROPPED (logged once per Can→Cannot edge) while removals and searches
  continue. :class:`MemoryWatcher` polls /proc (cgroup v2 limits win over
  host totals, mirroring ``available_memory``'s cgroup branch) on a lazy
  1-second refresh — batch jobs have no actor loop, so the check happens on
  use, which is when the reference's consumer reads the watch channel anyway.

- **R8 concurrency modes** (usearch.rs:515-623): per-index operation state
  machine — Insert and Search run concurrently with themselves, Remove and
  Reserve are EXCLUSIVE (USearch cannot run them concurrently with anything,
  see unum-cloud/USearch#697). :class:`OperationGate` is the same algorithm
  on ``threading.Condition``: the mode only switches when the in-flight
  counter drains to zero, and exclusive modes additionally wait until they
  are alone.

Spark note: these guards protect the DRIVER-ORCHESTRATED maintenance
lifecycle (which leaf rewrite may proceed), not row-level work — executors
never block on them. At 100 TB the gate costs one lock per *wave*, not per
row.
"""

from __future__ import annotations

import enum
import threading
import time

#: usearch.rs:440-443
RESERVE_INCREMENT_GLOBAL = 1_000_000
RESERVE_INCREMENT_LOCAL = 1_000
#: perf::channel_size default — the reference's free-capacity threshold
DEFAULT_FREE_THRESHOLD = 128

#: memory.rs:23-25
MEMORY_SAFETY_BUFFER_RATIO = 0.01
MEMORY_SAFETY_BUFFER_MIN = 200 * 1024 * 1024
MEMORY_INFO_REFRESH_INTERVAL = 1.0  # seconds


class Allocate(enum.Enum):
    """memory.rs:27-31."""

    CAN = "can"
    CANNOT = "cannot"


class AdmissionError(RuntimeError):
    """Raised when a maintenance add-wave is refused under memory pressure.

    The reference DROPS the AddVector message (usearch.rs:1156-1177) because
    its in-memory index is rebuilt from the database on restart — a dropped
    add is transient. In this engine the parquet layout IS the persisted
    state, so a dropped wave would be permanent silent divergence; batch
    callers get a catchable error (and may opt back into drop semantics
    explicitly)."""


class Mode(enum.Enum):
    """usearch.rs:525-531."""

    RESERVE = "reserve"
    INSERT = "insert"
    REMOVE = "remove"
    SEARCH = "search"

    @property
    def is_exclusive(self) -> bool:
        # usearch.rs:546-555: Remove and Reserve are not safe to run
        # concurrently with other operations (USearch#697)
        return self in (Mode.RESERVE, Mode.REMOVE)


def calculate_memory_limit(available_memory: int, config_limit: int | None = None) -> int:
    """memory.rs:149-160: limit = available − max(1% · available, 200 MB),
    further clamped by an explicit configured limit if one is set."""
    safety = max(int(available_memory * MEMORY_SAFETY_BUFFER_RATIO),
                 MEMORY_SAFETY_BUFFER_MIN)
    system_limit = max(available_memory - safety, 0)
    return min(config_limit, system_limit) if config_limit is not None else system_limit


def _read_proc_memory() -> tuple[int, int]:
    """(available_total, used) in bytes. cgroup v2 limits win over host
    totals when present (memory.rs:129-147's cgroup branch); /proc/meminfo
    otherwise."""
    try:
        with open("/sys/fs/cgroup/memory.max") as f:
            mx = f.read().strip()
        if mx != "max":
            with open("/sys/fs/cgroup/memory.current") as f:
                cur = int(f.read().strip())
            return int(mx), cur
    except OSError:
        pass
    info = {}
    with open("/proc/meminfo") as f:
        for line in f:
            parts = line.split()
            if parts[0].rstrip(":") in ("MemTotal", "MemAvailable"):
                info[parts[0].rstrip(":")] = int(parts[1]) * 1024
    total = info.get("MemTotal", 0)
    used = total - info.get("MemAvailable", total)
    return total, used


class MemoryWatcher:
    """R7: lazy 1-second-refresh admission watcher.

    ``check_memory_allocation(is_add)`` is the gate the index consumer runs
    per message (usearch.rs:1156-1177): non-add operations always pass; adds
    pass while used < limit and are dropped (False) otherwise, with the
    Can→Cannot edge logged once."""

    def __init__(self, config_limit: int | None = None,
                 refresh_interval: float = MEMORY_INFO_REFRESH_INTERVAL,
                 _read=_read_proc_memory):
        self._read = _read
        self._refresh_interval = refresh_interval
        total, used = self._read()
        self.memory_limit = calculate_memory_limit(total, config_limit)
        self._allocate = Allocate.CAN if used < self.memory_limit else Allocate.CANNOT
        self._allocate_prev = Allocate.CAN
        self._last_refresh = time.monotonic()
        self._lock = threading.Lock()

    def can_allocate(self) -> Allocate:
        with self._lock:
            now = time.monotonic()
            if now - self._last_refresh >= self._refresh_interval:
                _, used = self._read()
                self._allocate = (
                    Allocate.CAN if used < self.memory_limit else Allocate.CANNOT
                )
                self._last_refresh = now
            return self._allocate

    def check_memory_allocation(self, is_add: bool, key: str = "") -> bool:
        if not is_add:
            return True  # usearch.rs:1163-1165: only AddVector is gated
        allocate = self.can_allocate()
        if allocate == Allocate.CANNOT:
            if self._allocate_prev == Allocate.CAN:
                import logging

                logging.getLogger(__name__).error(
                    "Unable to add vector for index %s: not enough memory "
                    "to reserve more space", key,
                )
            self._allocate_prev = allocate
            return False
        self._allocate_prev = allocate
        return True


class PartitionCapacity:
    """R6: the size/capacity/increment arithmetic of PartitionState
    (usearch.rs:626-670)."""

    def __init__(self, is_global: bool = True,
                 free_threshold: int = DEFAULT_FREE_THRESHOLD):
        self.size = 0
        self.capacity = 0
        self.capacity_increment = (
            RESERVE_INCREMENT_GLOBAL if is_global else RESERVE_INCREMENT_LOCAL
        )
        self.free_threshold = free_threshold

    def needs_more_capacity(self) -> int | None:
        """Next target capacity when free space dips under the channel size
        (usearch.rs:655-666); None while there is headroom."""
        if self.capacity - self.size < self.free_threshold:
            return self.capacity + self.capacity_increment
        return None

    def reserve(self, capacity: int) -> None:
        """Commit a reservation. The CALLER must hold an exclusive RESERVE
        permit (dispatch_task's permit_for_reserve, usearch.rs:905-917)."""
        if capacity > self.capacity:
            self.capacity = capacity

    def added(self, n: int = 1) -> None:
        self.size += n

    def removed(self, n: int = 1) -> None:
        self.size = max(0, self.size - n)


class _Permit:
    def __init__(self, gate: "OperationGate"):
        self._gate = gate
        self._released = False

    def release(self) -> None:
        if self._released:
            return
        self._released = True
        with self._gate._cond:
            self._gate._counter -= 1
            if self._gate._counter == 0:
                self._gate._cond.notify_all()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.release()


class OperationGate:
    """R8: the per-index operation state machine (usearch.rs:515-623).

    ``permit(mode)`` blocks until the gate is in ``mode`` (the mode may only
    flip while the in-flight counter is zero) and, for exclusive modes
    (Remove/Reserve), until the caller is alone. Released permits wake
    waiters. Same-mode Insert/Search permits stack concurrently."""

    def __init__(self):
        self._mode = Mode.INSERT  # Operation::new starts in Insert
        self._counter = 0
        self._waiting_exclusive = 0
        self._cond = threading.Condition()

    def permit(self, mode: Mode, timeout: float | None = None) -> _Permit:
        deadline = None if timeout is None else time.monotonic() + timeout
        is_excl = mode.is_exclusive
        with self._cond:
            # Single wait loop re-validating ALL conditions after every
            # wakeup: the reference serializes permit() through one dispatch
            # task (&mut self), but this gate is entered from many threads,
            # so the mode can flip while an exclusive waiter sleeps — the
            # mode check must be re-run after the exclusivity drain, not
            # only before it. Pending exclusives also bar NEW non-exclusive
            # admissions (the dispatch task's FIFO gives the reference this
            # for free; without it a stream of Insert/Search permits starves
            # Remove/Reserve forever).
            if is_excl:
                self._waiting_exclusive += 1
            try:
                while (
                    self._mode != mode
                    or (is_excl and self._counter != 0)
                    or (not is_excl and self._waiting_exclusive > 0)
                ):
                    can_flip = self._counter == 0 and (
                        is_excl or self._waiting_exclusive == 0
                    )
                    if can_flip and self._mode != mode:
                        self._mode = mode
                        # wake same-mode waiters so Insert/Search can stack
                        self._cond.notify_all()
                        continue
                    if not self._cond.wait(self._remaining(deadline)):
                        raise TimeoutError(f"gate stuck awaiting mode {mode}")
            finally:
                if is_excl:
                    self._waiting_exclusive -= 1
                    if self._waiting_exclusive == 0:
                        # a timed-out (or admitted) exclusive no longer bars
                        # non-exclusive waiters — wake them to re-check
                        self._cond.notify_all()
            self._counter += 1
        return _Permit(self)

    @staticmethod
    def _remaining(deadline: float | None) -> float | None:
        if deadline is None:
            return None
        rem = deadline - time.monotonic()
        if rem <= 0:
            raise TimeoutError("gate wait timed out")
        return rem

    @property
    def in_flight(self) -> int:
        with self._cond:
            return self._counter

    @property
    def mode(self) -> Mode:
        with self._cond:
            return self._mode


#: process-wide defaults the maintenance paths consult when the caller does
#: not inject their own (one gate per persisted layout path)
_GATES: dict[str, OperationGate] = {}
_CAPACITIES: dict[str, PartitionCapacity] = {}
_GATES_LOCK = threading.Lock()
_WATCHER: MemoryWatcher | None = None


def gate_for(path: str) -> OperationGate:
    with _GATES_LOCK:
        if path not in _GATES:
            _GATES[path] = OperationGate()
        return _GATES[path]


def capacity_for(path: str, is_global: bool = True) -> PartitionCapacity:
    with _GATES_LOCK:
        if path not in _CAPACITIES:
            _CAPACITIES[path] = PartitionCapacity(is_global=is_global)
        return _CAPACITIES[path]


def default_watcher() -> MemoryWatcher:
    global _WATCHER
    if _WATCHER is None:
        _WATCHER = MemoryWatcher()
    return _WATCHER
