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

    spark = get_spark("correctness-check", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs = e.queries()
    oracles = e.oracle_sql()
    selected = names or list(qs)
    n_pass = n_fail = n_weak = n_excl = 0
    for name in selected:
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
        watchdog = None
        timed_out = {"hit": False}
        if _ORACLE_TIMEOUT:
            import threading

            def _interrupt():
                timed_out["hit"] = True
                con.interrupt()

            watchdog = threading.Timer(_ORACLE_TIMEOUT, _interrupt)
            watchdog.daemon = True
            watchdog.start()
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            atbl = res.fetch_arrow_table()
            if len(set(dcols)) != len(dcols):
                raise ValueError(f"oracle emits duplicate column names: {dcols}")
            # build rows from column arrays (a dict-per-row would silently
            # drop duplicate-named columns and misalign against dcols)
            dcol_arrays = [atbl.column(i).to_pylist() for i in range(atbl.num_columns)]
            drows = list(zip(*dcol_arrays)) if dcol_arrays else []
        except Exception as ex:
            if timed_out["hit"]:
                print(f"EXCL  {name}: oracle timeout after {_ORACLE_TIMEOUT:.0f}s "
                      f"(spark rows={len(srows)})")
                records[name] = {"status": "excluded",
                                 "detail": f"oracle_timeout {_ORACLE_TIMEOUT:.0f}s",
                                 "rows": len(srows)}
                n_excl += 1
            else:
                print(f"FAIL  {name}: duckdb error: {ex}")
                records[name] = {"status": "fail", "detail": f"duckdb error: {ex}"}
                n_fail += 1
            continue
        finally:
            if watchdog is not None:
                watchdog.cancel()
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
            print(f"PASS  {name} ({len(srows)} rows)")
            records[name] = {"status": "pass", "rows": len(srows)}
            n_pass += 1
    tail = f", {n_excl} excluded (oracle timeout)" if n_excl else ""
    print(f"\n{n_pass} pass, {n_weak} weak (rows-only), {n_fail} fail{tail}")
    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump({
                "sf_dir": SF_DIR,
                "total": len(selected),
                "pass": n_pass,
                "weak_rows_only": n_weak,
                "fail": n_fail,
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
    return 1 if n_fail else 0


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
