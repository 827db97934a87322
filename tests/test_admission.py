"""R6/R7/R8 — capacity reservation, memory admission, concurrency modes
(operators/admission.py re-expressing memory.rs + usearch.rs:440-670,
897-943, 1156-1177)."""

import threading
import time

import pytest

from vector_store_spark.operators.admission import (
    DEFAULT_FREE_THRESHOLD,
    MEMORY_SAFETY_BUFFER_MIN,
    RESERVE_INCREMENT_GLOBAL,
    RESERVE_INCREMENT_LOCAL,
    Allocate,
    MemoryWatcher,
    Mode,
    OperationGate,
    PartitionCapacity,
    calculate_memory_limit,
)


# -- R7 memory admission ------------------------------------------------------

def test_memory_limit_formula():
    # memory.rs:149-160: limit = avail − max(1% avail, 200 MB)
    gib = 1024 ** 3
    avail = 100 * gib
    assert calculate_memory_limit(avail) == avail - gib  # 1% > 200 MB
    small = 10 * gib
    assert calculate_memory_limit(small) == small - MEMORY_SAFETY_BUFFER_MIN
    # a configured limit clamps but never exceeds the system limit
    assert calculate_memory_limit(avail, config_limit=5 * gib) == 5 * gib
    assert calculate_memory_limit(avail, config_limit=200 * gib) == avail - gib


def test_watcher_drops_adds_under_pressure_only():
    used = {"v": 0}
    w = MemoryWatcher(refresh_interval=0.0, _read=lambda: (10 * 1024 ** 3, used["v"]))
    assert w.can_allocate() == Allocate.CAN
    assert w.check_memory_allocation(True) is True
    used["v"] = 11 * 1024 ** 3  # above the limit
    assert w.can_allocate() == Allocate.CANNOT
    # AddVector dropped; everything else still admitted (usearch.rs:1163-1165)
    assert w.check_memory_allocation(True) is False
    assert w.check_memory_allocation(False) is True
    used["v"] = 0
    assert w.check_memory_allocation(True) is True


def test_watcher_refresh_is_lazy():
    reads = {"n": 0}

    def _read():
        reads["n"] += 1
        return (10 * 1024 ** 3, 0)

    w = MemoryWatcher(refresh_interval=3600.0, _read=_read)
    n0 = reads["n"]
    for _ in range(10):
        w.can_allocate()
    assert reads["n"] == n0  # within the interval: no re-read


def test_default_watcher_reads_this_host():
    # the real /proc//cgroup path must parse to a positive limit; whether
    # adds are admitted depends on the machine's current load, so only
    # assert it when headroom is actually observed (no environment flake)
    from vector_store_spark.operators.admission import _read_proc_memory

    w = MemoryWatcher()
    assert w.memory_limit > 0
    _, used = _read_proc_memory()
    if used < w.memory_limit:
        assert w.check_memory_allocation(True) is True


# -- R6 capacity reservation --------------------------------------------------

def test_capacity_increments_global_vs_local():
    # usearch.rs:440-443, 640-645
    g = PartitionCapacity(is_global=True)
    loc = PartitionCapacity(is_global=False)
    assert g.capacity_increment == RESERVE_INCREMENT_GLOBAL == 1_000_000
    assert loc.capacity_increment == RESERVE_INCREMENT_LOCAL == 1_000


def test_needs_more_capacity_threshold():
    # usearch.rs:655-666: reserve when free < channel size
    cap = PartitionCapacity(is_global=False, free_threshold=100)
    assert cap.needs_more_capacity() == 1_000  # empty index: 0 free
    cap.reserve(1_000)
    assert cap.needs_more_capacity() is None  # 1000 free ≥ 100
    cap.added(950)
    assert cap.needs_more_capacity() == 2_000  # 50 free < 100
    cap.removed(500)
    assert cap.needs_more_capacity() is None
    assert DEFAULT_FREE_THRESHOLD == 128


def test_reserve_never_shrinks():
    cap = PartitionCapacity(is_global=False)
    cap.reserve(2_000)
    cap.reserve(1_000)
    assert cap.capacity == 2_000


# -- R8 concurrency modes -----------------------------------------------------

def test_insert_and_search_stack_concurrently():
    gate = OperationGate()
    p1 = gate.permit(Mode.INSERT, timeout=1)
    p2 = gate.permit(Mode.INSERT, timeout=1)
    assert gate.in_flight == 2
    p1.release(); p2.release()
    s1 = gate.permit(Mode.SEARCH, timeout=1)
    s2 = gate.permit(Mode.SEARCH, timeout=1)
    assert gate.in_flight == 2 and gate.mode == Mode.SEARCH
    s1.release(); s2.release()


def test_mode_switch_waits_for_drain():
    gate = OperationGate()
    ins = gate.permit(Mode.INSERT, timeout=1)
    got = threading.Event()

    def searcher():
        p = gate.permit(Mode.SEARCH, timeout=5)
        got.set()
        p.release()

    t = threading.Thread(target=searcher)
    t.start()
    time.sleep(0.15)
    assert not got.is_set()  # blocked: insert still in flight
    ins.release()
    t.join(timeout=5)
    assert got.is_set()


@pytest.mark.parametrize("mode", [Mode.REMOVE, Mode.RESERVE])
def test_exclusive_modes_wait_for_solo(mode):
    # usearch.rs:546-555: Remove and Reserve run alone (USearch#697)
    gate = OperationGate()
    first = gate.permit(mode, timeout=1)
    assert gate.in_flight == 1
    got = threading.Event()

    def second():
        p = gate.permit(mode, timeout=5)
        got.set()
        p.release()

    t = threading.Thread(target=second)
    t.start()
    time.sleep(0.15)
    assert not got.is_set()  # same-mode but exclusive: must wait
    first.release()
    t.join(timeout=5)
    assert got.is_set()


def test_permit_context_manager_and_timeout():
    gate = OperationGate()
    with gate.permit(Mode.INSERT):
        with pytest.raises(TimeoutError):
            gate.permit(Mode.REMOVE, timeout=0.1)
    assert gate.in_flight == 0


def test_interleaved_workload_is_serializable():
    """Hammer the gate from 12 threads mixing all four modes; assert the
    invariants the reference's state machine guarantees: exclusive modes
    observe themselves alone, and concurrent modes never interleave with a
    different mode."""
    gate = OperationGate()
    violations = []
    active: dict[Mode, int] = {m: 0 for m in Mode}
    lock = threading.Lock()

    def worker(mode):
        for _ in range(25):
            with gate.permit(mode, timeout=30):
                with lock:
                    active[mode] += 1
                    others = sum(v for m, v in active.items() if m != mode)
                    if others:
                        violations.append((mode, dict(active)))
                    if mode.is_exclusive and active[mode] > 1:
                        violations.append((mode, dict(active)))
                time.sleep(0.001)
                with lock:
                    active[mode] -= 1

    threads = [
        threading.Thread(target=worker, args=(m,))
        for m in (Mode.INSERT, Mode.SEARCH, Mode.REMOVE, Mode.RESERVE)
        for _ in range(3)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    assert not violations, violations[:3]


# -- wiring: the IVF CRUD wave runs under the trio ---------------------------

def test_ivf_update_capacity_accounting(spark, sf_dir, tmp_path):
    from vector_store_spark.operators import admission
    from vector_store_spark.operators.ivf import ivf_build, ivf_update

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    path = str(tmp_path / "ivf_adm")
    ivf_build(emb.limit(64), "vec_id", "embedding", path, k_centroids=4)
    cap = admission.capacity_for(path)
    before = cap.capacity
    ivf_update(spark, path, "vec_id", "embedding",
               items_added=emb.where("vec_id >= 64").limit(8))
    # R6: the first add wave reserved one global increment and counted adds
    assert cap.capacity == before + RESERVE_INCREMENT_GLOBAL
    assert cap.size >= 8
    # R8: the gate drained back to idle
    assert admission.gate_for(path).in_flight == 0


def test_ivf_update_refuses_adds_when_memory_cannot(spark, sf_dir, tmp_path, monkeypatch):
    from vector_store_spark.operators import admission
    from vector_store_spark.operators.admission import AdmissionError
    from vector_store_spark.operators.ivf import ivf_build, ivf_update

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    path = str(tmp_path / "ivf_oom")
    ivf_build(emb.limit(64), "vec_id", "embedding", path, k_centroids=4)
    n_before = spark.read.parquet(path).count()
    starved = MemoryWatcher(refresh_interval=0.0,
                            _read=lambda: (1024 ** 3, 2 * 1024 ** 3))
    monkeypatch.setattr(admission, "_WATCHER", starved)
    # R7, batch default: the parquet layout is the source of truth, so a
    # refused wave is a LOUD, catchable error — not silent divergence
    with pytest.raises(AdmissionError):
        ivf_update(spark, path, "vec_id", "embedding",
                   items_added=emb.where("vec_id >= 64").limit(8))
    assert spark.read.parquet(path).count() == n_before
    # opting into the reference's literal drop semantics reports the drop
    status = ivf_update(spark, path, "vec_id", "embedding",
                        items_added=emb.where("vec_id >= 64").limit(8),
                        on_memory_pressure="drop")
    assert status == {"added": 0, "removed": 0, "add_wave_dropped": True}
    assert spark.read.parquet(path).count() == n_before
    # ...and removals still process either way (usearch.rs:1163-1165)
    victim = spark.read.parquet(path).select("vec_id").first()[0]
    status = ivf_update(spark, path, "vec_id", "embedding", ids_removed=[victim])
    assert status["removed"] == 1 and not status["add_wave_dropped"]
    assert spark.read.parquet(path).count() == n_before - 1


def test_exclusive_waiter_revalidates_mode_after_drain():
    """Regression for the permit() race: while an exclusive (REMOVE) waiter
    sleeps in its drain-wait, other threads flip the mode through
    INSERT/SEARCH cycles; when the counter drains the exclusive waiter must
    NOT take a permit under a non-exclusive mode."""
    gate = OperationGate()
    stop = threading.Event()
    violations = []

    def churner():
        while not stop.is_set():
            for m in (Mode.INSERT, Mode.SEARCH):
                try:
                    with gate.permit(m, timeout=5):
                        time.sleep(0.0005)
                except TimeoutError:
                    return

    def remover():
        for _ in range(40):
            with gate.permit(Mode.REMOVE, timeout=30):
                # invariant: an exclusive permit implies exclusive mode+solo
                if gate.mode != Mode.REMOVE or gate.in_flight != 1:
                    violations.append((gate.mode, gate.in_flight))
                time.sleep(0.0005)

    churners = [threading.Thread(target=churner) for _ in range(4)]
    rem = threading.Thread(target=remover)
    for t in churners:
        t.start()
    rem.start()
    rem.join(timeout=60)
    stop.set()
    for t in churners:
        t.join(timeout=10)
    assert not violations, violations[:3]
