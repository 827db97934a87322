"""Local stand-in for the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB at sf0.01, compare row count, column
names, and order-insensitive values.

Usage: python tools/check_correctness.py [--json OUT.json] [name ...]

``--json`` additionally writes a machine-readable record per entry —
the full-surface insurance file committed each round
(CORRECTNESS_local_rN.json) so coverage outside the driver's rotating
window stays a standing fact.
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
# Oracle parity is SF-independent; the stretch gate runs the same check at a
# LARGER sf to catch driver-side constants accidentally sized to sf0.01
# (salting caps, block grids). Distinct env var from bench's
# SPARK_GRAFT_SF_DIR so a driver-exported bench dir can't silently move the
# correctness gate.
SF_DIR = os.environ.get("SPARK_GRAFT_CHECK_SF_DIR", "/root/testdata/sf0.01")
#: optional per-oracle watchdog (seconds) for stretch-SF runs — see the
#: EXCLUDED handling in main()
_ORACLE_TIMEOUT = float(os.environ.get("SPARK_GRAFT_ORACLE_TIMEOUT", "0") or 0)
#: memoized-oracle setup statements (shared CTE chains materialized once per
#: run as temp tables) get their own, larger watchdog: one setup amortizes
#: over every entry that references the table
_SETUP_TIMEOUT = float(
    os.environ.get("SPARK_GRAFT_ORACLE_SETUP_TIMEOUT", "0")
    or (3 * _ORACLE_TIMEOUT)
)
#: memoized rewrites are preferred wherever a QuerySpec registers one
#: (SPARK_GRAFT_ORACLE_MEMO=0 forces the self-contained driver variant)
_USE_MEMO = os.environ.get("SPARK_GRAFT_ORACLE_MEMO", "1") != "0"
#: EXCLUDED (oracle_timeout) entries fail the gate unless consciously
#: accepted: exclusions above this count flip the exit code nonzero, so a
#: stretch gate whose heavy oracles all time out cannot silently read green
_MAX_EXCLUDED = int(os.environ.get("SPARK_GRAFT_MAX_EXCLUDED", "0") or 0)


def _parallel_capacity_probe() -> dict:
    """Self-normalizing host parallel-capacity probe (VERDICT r16 #8):
    the sf3/sf10 stretch gates have tripped watchdogs that were later
    adjudicated 'contention-only'; bracketing every shard record with the
    same fixed (shared-blob, GIL-free) probe bench.py gates on makes that
    self-evident from the JSON alone. Healthy ~1-1.5; see bench.py
    _CALIB_PAR_MAX for the band discussion."""
    import hashlib
    import threading
    import time as _time

    blob = b"\x5a" * 1_000_000

    def _hash(n=100):
        h = hashlib.sha256()
        for _ in range(n):
            h.update(blob)

    t0 = _time.perf_counter()
    _hash()
    single = _time.perf_counter() - t0
    n_threads = min(32, os.cpu_count() or 32)
    threads = [threading.Thread(target=_hash) for _ in range(n_threads)]
    t0 = _time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    par = _time.perf_counter() - t0
    return {
        "single_sec": round(single, 4),
        "parallel_sec": round(par, 4),
        "threads": n_threads,
        "parallel_over_single": round(par / single, 2) if single else None,
    }


def _cleanup_spill_dirs(own_path: str | None) -> None:
    """Remove this process's DuckDB spill dir plus any orphaned
    /tmp/duckdb_spill_<pid> left by crashed/killed shards whose PID is gone
    (ADVICE r16: the per-PID dirs accumulated forever). Live shards are
    never touched — their /proc/<pid> exists. Called explicitly before
    exit because the gate ends with os._exit (atexit never runs)."""
    import glob
    import re as _re
    import shutil

    if own_path:
        shutil.rmtree(own_path, ignore_errors=True)
    for d in glob.glob("/tmp/duckdb_spill_*"):
        m = _re.match(r".*/duckdb_spill_(\d+)$", d)
        if not m:
            continue
        pid = int(m.group(1))
        if pid != os.getpid() and not os.path.exists(f"/proc/{pid}"):
            shutil.rmtree(d, ignore_errors=True)


class _OracleWatchdog:
    """Per-statement DuckDB interrupt timer without the cancel() race: the
    timer re-checks a done flag INSIDE the callback, and ``finish()`` sets it
    before the caller leaves the try block — a timer that fires between the
    statement completing and cancel() running becomes a no-op instead of
    landing a stray interrupt on the NEXT oracle (ADVICE r13)."""

    def __init__(self, con, timeout: float):
        import threading

        self.hit = False
        self._done = False
        self._lock = threading.Lock()
        self._timer = None
        if timeout:
            def _interrupt():
                with self._lock:
                    if self._done:
                        return
                    self.hit = True
                    con.interrupt()

            self._timer = threading.Timer(timeout, _interrupt)
            self._timer.daemon = True
            self._timer.start()

    def finish(self):
        with self._lock:
            self._done = True
        if self._timer is not None:
            self._timer.cancel()


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return repr(float(v))
        return repr(v)
    if isinstance(v, bool):
        return str(v)
    return str(v)


def type_class(t: str) -> str:
    """Coarse numeric-type family for Spark dtypes and Arrow type strings.

    The driver's hash is type-sensitive across Arrow families (e.g. DuckDB
    integer sum() -> HUGEINT -> decimal128(38,0) vs Spark int64 hashed
    differently even with equal values), so the local gate must flag any
    family divergence. int widths are treated as one family: both engines
    surface them through pandas with identical reprs.
    """
    t = t.lower()
    if t.startswith("decimal"):
        return "decimal"
    if t in ("float", "double", "halffloat", "float16", "float32", "float64"):
        return "float"
    if t.startswith(("int", "uint", "bigint", "smallint", "tinyint", "hugeint")) or t in ("long", "short", "byte"):
        return "int" if not t.startswith("hugeint") else "hugeint"
    return "other"


def type_problems(spark_dtypes, arrow_schema):
    sd = {name: type_class(dt) for name, dt in spark_dtypes}
    out = []
    for field in arrow_schema:
        dc = type_class(str(field.type))
        sc = sd.get(field.name)
        if sc is not None and sc != dc:
            out.append(f"type {field.name}: spark={sc} oracle={dc} ({field.type})")
    return out


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = list(r)
        out.append(tuple(norm_cell(vals[i]) for i in order))
    return sorted(out)


def main(names=None, json_out=None):
    import time

    import __spark_entry__ as e
    from vector_store_spark.session import get_spark

    t_start = time.time()
    records = {}
    capacity_at_start = _parallel_capacity_probe()

    spark = get_spark("correctness-check", shuffle_partitions=8)
    spill_dir = (f"/tmp/duckdb_spill_{os.getpid()}"
                 if os.environ.get("SPARK_GRAFT_ORACLE_MEM") else None)

    def _fresh_con():
        c = duckdb.connect()
        # stretch-SF hygiene: DuckDB defaults its memory budget to ~80% of
        # HOST RAM per process — N gate shards each sizing to the whole box
        # OOM-killed an sf3 shard at 103 GB RSS (r14). A bounded budget makes
        # heavy oracles SPILL to the temp dir instead of dying; unset keeps
        # the default for plain single-process runs.
        memlimit = os.environ.get("SPARK_GRAFT_ORACLE_MEM", "")
        if memlimit:
            c.execute(f"SET memory_limit='{memlimit}'")
            # per-PROCESS spill dir: concurrent gate shards sharing one
            # temp_directory clobber/delete each other's spill blocks
            # ("Cannot open file .../duckdb_temp_block-...": observed r16,
            # two spill-heavy knn oracles in parallel runs) — DuckDB assumes
            # it owns the directory
            c.execute(
                f"SET temp_directory='/tmp/duckdb_spill_{os.getpid()}'")
        # N gate shards each defaulting to all-cores DuckDB oversubscribe a
        # shared (or capacity-degraded — see BENCH_NOTES_r16.md) host into
        # watchdog trips; a bounded per-shard thread budget keeps heavy
        # oracles predictable. Unset keeps the default for solo runs.
        threads = os.environ.get("SPARK_GRAFT_ORACLE_THREADS", "")
        if threads:
            c.execute(f"SET threads={int(threads)}")
        for t in TABLES:
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
        return c

    con = _fresh_con()
    # temp tables created by memo setup live on `con`; a connection recreate
    # (post-timeout hygiene) drops them, so track what exists per connection
    memo_tables: set = set()
    memo_setup_sec: dict = {}

    qs = e.queries()
    oracles = e.oracle_sql()
    from vector_store_spark.registry import all_queries as _all_specs

    specs = _all_specs()
    selected = names or list(qs)
    # explicit, visible exclusions for stretch-SF gates: "name=reason;..."
    # — an oracle that is RESOURCE-infeasible at the gate SF (e.g. a
    # Σ|bucket|² candidate set whose DISTINCT exceeds box memory+disk) is
    # recorded as excluded WITH its reason instead of either a misleading
    # infra FAIL or a silent drop. Counts against SPARK_GRAFT_MAX_EXCLUDED
    # like a timeout exclusion, so it must be consciously accepted.
    skip_reasons = {}
    for part in (os.environ.get("SPARK_GRAFT_ORACLE_SKIP", "") or "").split(";"):
        if "=" in part:
            k, _, v = part.partition("=")
            skip_reasons[k.strip()] = v.strip()
    n_pass = n_fail = n_weak = n_excl = 0
    for name in selected:
        if name in skip_reasons:
            print(f"EXCLUDED  {name}: {skip_reasons[name]}")
            records[name] = {"status": "excluded",
                             "detail": skip_reasons[name]}
            n_excl += 1
            continue
        fn = qs[name]
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            print(f"FAIL  {name}: spark error: {ex}")
            records[name] = {"status": "fail", "detail": f"spark error: {ex}"}
            n_fail += 1
            continue
        # The driver's value hasher runs on pandas cells and dies on
        # array/map/struct values ("unhashable type: 'list'") — fail locally
        # first so complex output columns never reach the driver. A local
        # policy check, NOT a Spark failure; only the hashed (oracled) path
        # is affected — rows-only queries never reach the driver's hasher.
        complex_cols = [
            f"{n2}:{t}" for n2, t in sdf.dtypes
            if t.startswith(("array", "map", "struct"))
        ]
        if complex_cols and name in oracles:
            print(
                f"FAIL  {name}: complex output columns (driver hasher can't "
                "hash them): " + ", ".join(complex_cols)
            )
            records[name] = {"status": "fail",
                             "detail": "complex output columns: " + ", ".join(complex_cols)}
            n_fail += 1
            continue
        if name not in oracles:
            print(f"WEAK  {name}: rows={len(srows)} (no oracle)")
            records[name] = {"status": "weak", "rows": len(srows)}
            n_weak += 1
            continue
        # stretch-SF guard: the heaviest DuckDB re-derivations (recursive
        # closures over 50k-doc shingle sets, within-cell pair CTEs over 8k
        # vectors) can run for tens of minutes at sf1. With
        # SPARK_GRAFT_ORACLE_TIMEOUT set (seconds), a watchdog interrupts
        # the oracle and the entry is recorded as EXCLUDED (oracle_timeout)
        # — a documented exclusion, not a pass and not an engine failure.
        spec = specs.get(name)
        osql = oracles[name]
        memoized = False
        if _USE_MEMO and spec is not None and spec.memo_sql:
            # materialize this entry's shared setup tables once per
            # connection; on setup failure/timeout fall back to the
            # self-contained oracle (which has its own watchdog)
            setup_ok = True
            for tname, tsql in spec.memo_setup or []:
                if tname in memo_tables:
                    continue
                swd = _OracleWatchdog(con, _SETUP_TIMEOUT)
                t0 = time.time()
                try:
                    con.execute(f"CREATE TEMP TABLE {tname} AS {tsql}")
                    memo_tables.add(tname)
                    memo_setup_sec[tname] = round(time.time() - t0, 1)
                    print(f"memo  {tname}: materialized in "
                          f"{memo_setup_sec[tname]:.1f}s", flush=True)
                except Exception as ex:
                    setup_ok = False
                    print(f"memo  {tname}: setup failed ({ex}); falling back "
                          f"to self-contained oracle for {name}", flush=True)
                finally:
                    swd.finish()
                if not setup_ok and swd.hit:
                    # interrupted connection hygiene: drop it (and its temp
                    # tables) so the pending state can't leak into the next
                    # statement
                    con = _fresh_con()
                    memo_tables = set()
                    break
            if setup_ok:
                osql = spec.memo_sql
                memoized = True
        wd = _OracleWatchdog(con, _ORACLE_TIMEOUT)
        try:
            res = con.execute(osql)
            dcols = [d[0] for d in res.description]
            atbl = res.fetch_arrow_table()
            if len(set(dcols)) != len(dcols):
                raise ValueError(f"oracle emits duplicate column names: {dcols}")
            # build rows from column arrays (a dict-per-row would silently
            # drop duplicate-named columns and misalign against dcols)
            dcol_arrays = [atbl.column(i).to_pylist() for i in range(atbl.num_columns)]
            drows = list(zip(*dcol_arrays)) if dcol_arrays else []
        except Exception as ex:
            if wd.hit:
                print(f"EXCL  {name}: oracle timeout after {_ORACLE_TIMEOUT:.0f}s "
                      f"(spark rows={len(srows)})")
                records[name] = {"status": "excluded",
                                 "detail": f"oracle_timeout {_ORACLE_TIMEOUT:.0f}s",
                                 "rows": len(srows)}
                n_excl += 1
                # the interrupt may have left connection state behind —
                # recreate so the next oracle starts clean
                con = _fresh_con()
                memo_tables = set()
            else:
                print(f"FAIL  {name}: duckdb error: {ex}")
                records[name] = {"status": "fail", "detail": f"duckdb error: {ex}"}
                n_fail += 1
            continue
        finally:
            wd.finish()
        if wd.hit:
            # timer fired in the finish() race window: the statement
            # completed, but an interrupt may be pending on the connection —
            # result is valid, connection is not; recreate before the next one
            con = _fresh_con()
            memo_tables = set()
        problems = []
        if sorted(scols) != sorted(dcols):
            problems.append(f"columns {scols} vs {dcols}")
        problems.extend(type_problems(sdf.dtypes, atbl.schema))
        if len(srows) != len(drows):
            problems.append(f"rowcount {len(srows)} vs {len(drows)}")
        if not problems:
            a, b = normalize(srows, scols), normalize(drows, dcols)
            if a != b:
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                problems.append(f"values differ, first diffs: {diff}")
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            records[name] = {"status": "fail", "detail": "; ".join(problems)}
            n_fail += 1
        else:
            memo_tag = " [memoized oracle]" if memoized else ""
            print(f"PASS  {name} ({len(srows)} rows){memo_tag}")
            records[name] = {"status": "pass", "rows": len(srows)}
            if memoized:
                records[name]["oracle_memoized"] = True
            n_pass += 1
    tail = f", {n_excl} excluded (oracle timeout)" if n_excl else ""
    print(f"\n{n_pass} pass, {n_weak} weak (rows-only), {n_fail} fail{tail}")
    if n_excl > _MAX_EXCLUDED:
        print(f"GATE: {n_excl} excluded > allowed {_MAX_EXCLUDED} "
              "(set SPARK_GRAFT_MAX_EXCLUDED to accept consciously) -> nonzero exit")
    capacity_at_end = _parallel_capacity_probe()
    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump({
                "sf_dir": SF_DIR,
                "total": len(selected),
                "pass": n_pass,
                "weak_rows_only": n_weak,
                "fail": n_fail,
                "excluded": n_excl,
                "max_excluded_allowed": _MAX_EXCLUDED,
                "memo_setup_sec": memo_setup_sec,
                # host parallel capacity bracketing the shard (healthy
                # ~1-1.5): watchdog trips on a reading >2.5 at either end
                # are host contention, not engine regressions
                "parallel32_over_single_at_start":
                    capacity_at_start["parallel_over_single"],
                "parallel32_over_single_at_end":
                    capacity_at_end["parallel_over_single"],
                "capacity_probe": {"start": capacity_at_start,
                                   "end": capacity_at_end},
                "entries": records,
            }, f, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    sys.stdout.flush()
    # bounded teardown, same contract as bench.py: once the verdict lines and
    # the JSON record are out, a wedged JVM shutdown must not hang the gate
    import threading

    stopper = threading.Thread(target=spark.stop, daemon=True)
    stopper.start()
    stopper.join(timeout=60)
    if stopper.is_alive():
        # the JVM's shutdown hooks won't run: reap this run's scratch dirs
        import bench

        bench._reap_spark_scratch(t_start)
    _cleanup_spill_dirs(spill_dir)
    return 1 if (n_fail or n_excl > _MAX_EXCLUDED) else 0


if __name__ == "__main__":
    argv = sys.argv[1:]
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    _rc = main(argv or None, json_out=json_out)
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(_rc)  # see bench.py: never let interpreter teardown outlive the record
