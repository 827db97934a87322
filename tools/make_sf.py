#!/usr/bin/env python3
"""Synthesize a larger scale factor from an existing testdata directory.

/root/testdata ships sf0.001 / sf0.01 / sf0.1 only; the stretch-SF
correctness gate (SPARK_GRAFT_CHECK_SF_DIR) caught real sf-dependent defects
two rounds running (kNN boundary-tie drops at sf0.1, partial-agg association
drift in money sums), so round 13 adds a 10x-of-sf0.1 gate on SYNTHESIZED
data. This script scales deterministically (fixed numpy seeds; no wall-clock,
no os.urandom), mirroring the driver generator's own proportions between SF
levels (everything x10, embeddings x4):

- region / nation: fixed-size dims, copied verbatim.
- customer / supplier / part / orders / lineitem: replicated FACTOR times
  with disjoint key-space shifts (key' = r * base_count + key) applied
  consistently to every foreign key, so each replica is a self-consistent
  TPC-H-ish sub-universe; Customer#/Supplier# names are regenerated from the
  shifted key (the source embeds the key in the name). Prices, dates,
  quantities are copied so money values stay on the same 4-dp grid the
  DECIMAL-sum oracles rely on.
- events: replicated with event_id/user_id shifts, timestamps kept (the
  event window is calendar-shaped at every shipped SF).
- documents: doc_id shift; replica 0 keeps the original text, replicas >0
  get a seeded token shuffle plus ~8% vocabulary substitutions — token
  multiset statistics (lengths, source/lang mix) are preserved while
  n-gram/shingle sets diverge, so the dedup-family profile stays sf0.1-like
  instead of collapsing into FACTOR-sized exact-dup clusters (which would
  change the workload character the oracles were sized for). n_chars is
  recomputed from the new text.
- embeddings: replicated EMB_FACTOR times (the generator's own x4 ratio);
  replicas >0 add seeded gaussian noise (sigma=0.12) and re-normalize to
  unit length, keeping labels — cluster structure is preserved and
  multiplied, not degenerate-duplicated (exact vector copies would make
  every top-k a tie pile-up, which is not what larger corpora look like).

Output schema is forced to match the source parquet schema column-for-column
(int32 vs int64, list<float32>), so Spark and DuckDB read sf1 exactly as
they read sf0.1.

Usage:
    python tools/make_sf.py [--src /root/testdata/sf0.1] [--out var/sf1]
                            [--factor 10] [--emb-factor 4] [--seed 13]
"""
from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _read(src: str, table: str) -> pa.Table:
    return pq.read_table(os.path.join(src, f"{table}.parquet"))


def _write(out: str, table: str, tbl: pa.Table) -> None:
    os.makedirs(out, exist_ok=True)
    pq.write_table(tbl, os.path.join(out, f"{table}.parquet"))
    print(f"  {table}: {tbl.num_rows} rows")


def _shift(col: pa.ChunkedArray, delta: int) -> pa.Array:
    arr = col.combine_chunks()
    return pa.compute.add(arr, pa.scalar(delta, type=arr.type))


def _replicate_shifted(
    tbl: pa.Table, shifts: dict[str, int], factor: int,
    rename: dict[str, tuple[str, str]] | None = None,
) -> pa.Table:
    """FACTOR copies; for replica r each key column named in `shifts` moves
    by r * base_count. `rename` maps name-column -> (prefix, key_column) for
    Customer#/Supplier# style regenerated names."""
    reps = []
    for r in range(factor):
        cols = {}
        for name in tbl.column_names:
            if name in shifts:
                cols[name] = _shift(tbl.column(name), r * shifts[name])
            else:
                cols[name] = tbl.column(name).combine_chunks()
        if rename:
            for name_col, (prefix, key_col) in rename.items():
                keys = cols[key_col].to_numpy(zero_copy_only=False)
                names = pa.array(
                    [f"{prefix}#{int(k):09d}" for k in keys], type=pa.string()
                )
                cols[name_col] = names
        reps.append(pa.table(cols, schema=tbl.schema))
    return pa.concat_tables(reps)


def scale_documents(tbl: pa.Table, factor: int, seed: int) -> pa.Table:
    n = tbl.num_rows
    texts = tbl.column("text").to_pylist()
    # global vocabulary for the substitution draw — sorted for determinism
    vocab = sorted({t for txt in texts for t in txt.split(" ")})
    vocab_arr = np.array(vocab, dtype=object)
    reps = []
    for r in range(factor):
        cols = {name: tbl.column(name).combine_chunks() for name in tbl.column_names}
        cols["doc_id"] = _shift(tbl.column("doc_id"), r * n)
        if r > 0:
            rng = np.random.RandomState(seed * 1_000_003 + r)
            new_texts = []
            for txt in texts:
                toks = txt.split(" ")
                k = len(toks)
                perm = rng.permutation(k)
                toks = [toks[i] for i in perm]
                n_sub = max(1, k // 12)  # ~8% substitutions
                sub_pos = rng.choice(k, size=min(n_sub, k), replace=False)
                sub_tok = rng.randint(0, len(vocab_arr), size=len(sub_pos))
                for p, v in zip(sub_pos, sub_tok):
                    toks[p] = vocab_arr[v]
                new_texts.append(" ".join(toks))
            cols["text"] = pa.array(new_texts, type=pa.string())
            cols["n_chars"] = pa.array(
                [len(t) for t in new_texts], type=tbl.schema.field("n_chars").type
            )
        reps.append(pa.table(cols, schema=tbl.schema))
    return pa.concat_tables(reps)


def scale_embeddings(tbl: pa.Table, factor: int, seed: int) -> pa.Table:
    n = tbl.num_rows
    vecs = np.array(tbl.column("embedding").to_pylist(), dtype=np.float64)
    dim = vecs.shape[1]
    emb_type = tbl.schema.field("embedding").type
    reps = []
    for r in range(factor):
        cols = {name: tbl.column(name).combine_chunks() for name in tbl.column_names}
        cols["vec_id"] = _shift(tbl.column("vec_id"), r * n)
        if r > 0:
            rng = np.random.RandomState(seed * 7_000_003 + r)
            noisy = vecs + rng.normal(0.0, 0.12, size=vecs.shape)
            noisy = noisy / np.linalg.norm(noisy, axis=1, keepdims=True)
            flat = noisy.astype(np.float32).ravel()
            offsets = np.arange(0, (n + 1) * dim, dim, dtype=np.int32)
            cols["embedding"] = pa.ListArray.from_arrays(
                pa.array(offsets), pa.array(flat, type=pa.float32())
            ).cast(emb_type)
        reps.append(pa.table(cols, schema=tbl.schema))
    return pa.concat_tables(reps)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "var", "sf1"))
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--emb-factor", type=int, default=4)
    ap.add_argument("--seed", type=int, default=13)
    ap.add_argument("--tables", default="",
                    help="comma-separated subset to synthesize (default all) "
                         "— e.g. --tables documents for the invariant gate's "
                         "docs-only sf30 rung, skipping the 180M-row lineitem")
    args = ap.parse_args()
    src, out, f = args.src, args.out, args.factor
    only = {t.strip() for t in args.tables.split(",") if t.strip()}

    def want(t):
        return not only or t in only

    print(f"scaling {src} -> {out} (x{f}, embeddings x{args.emb_factor}, "
          f"seed {args.seed}" + (f", tables {sorted(only)}" if only else "")
          + ")")

    for t in ("region", "nation"):
        if not want(t):
            continue
        _write(out, t, _read(src, t))

    cust = _read(src, "customer")
    n_cust = cust.num_rows
    if want("customer"):
        _write(out, "customer", _replicate_shifted(
            cust, {"c_custkey": n_cust}, f, rename={"c_name": ("Customer", "c_custkey")}))

    supp = _read(src, "supplier")
    n_supp = supp.num_rows
    if want("supplier"):
        _write(out, "supplier", _replicate_shifted(
            supp, {"s_suppkey": n_supp}, f, rename={"s_name": ("Supplier", "s_suppkey")}))

    part = _read(src, "part")
    n_part = part.num_rows
    if want("part"):
        _write(out, "part", _replicate_shifted(part, {"p_partkey": n_part}, f))

    orders = _read(src, "orders")
    n_ord = orders.num_rows
    if want("orders"):
        _write(out, "orders", _replicate_shifted(
            orders, {"o_orderkey": n_ord, "o_custkey": n_cust}, f))

    if want("lineitem"):
        li = _read(src, "lineitem")
        _write(out, "lineitem", _replicate_shifted(
            li, {"l_orderkey": n_ord, "l_partkey": n_part, "l_suppkey": n_supp}, f))

    if want("events"):
        ev = _read(src, "events")
        n_users = int(pa.compute.max(ev.column("user_id")).as_py()) + 1
        _write(out, "events", _replicate_shifted(
            ev, {"event_id": ev.num_rows, "user_id": n_users}, f))

    if want("documents"):
        _write(out, "documents", scale_documents(_read(src, "documents"), f, args.seed))
    if want("embeddings"):
        _write(out, "embeddings", scale_embeddings(
            _read(src, "embeddings"), args.emb_factor, args.seed))
    print("done")


if __name__ == "__main__":
    main()
