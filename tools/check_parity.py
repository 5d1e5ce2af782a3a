"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and the matching
``oracle_sql()`` on DuckDB over the same sf dir, then compares row count,
column names, and an order-insensitive value hash (rows sorted, values
canonicalised). Usage::

    python tools/check_parity.py [sf_dir] [query ...]

Defaults to sf0.01 (the driver's t2 scale) and all queries.
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from ccm_spark.session import get_spark  # noqa: E402
from ccm_spark.sources.tables import TABLES  # noqa: E402


def canon(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            v = 0.0  # collapse -0.0
        return repr(v)
    return str(v)


def nonscalar_spark_cols(schema) -> list[tuple[str, str]]:
    """Output columns the driver's canonicalizer cannot hash (it sorts a
    pandas frame — array/map/struct values raise `TypeError: unhashable
    type: 'list'`; the r10 quantize_embeddings red row). Gated queries
    must flatten these before returning."""
    return [
        (f.name, f.dataType.simpleString())
        for f in schema.fields
        if f.dataType.typeName() in ("array", "map", "struct")
    ]


def nonscalar_duckdb_cols(cols, types) -> list[tuple[str, str]]:
    """DuckDB twin of nonscalar_spark_cols: LIST/STRUCT/MAP outputs."""
    return [
        (c, str(t))
        for c, t in zip(cols, types)
        if any(k in str(t).upper() for k in ("[]", "LIST", "STRUCT", "MAP"))
    ]


def table_hash(cols: list[str], rows: list[tuple]) -> tuple[int, str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(canon(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return len(rows), h


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("check-parity", master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            # The driver's canonicalizer sorts a pandas frame, which
            # throws `TypeError: unhashable type: 'list'` on ANY
            # array/map/struct output column (the r10 quantize red row).
            # Our canon() used to fall through to str(v) and happily
            # stringify lists, so preflight passed while the driver
            # failed. Hard-fail non-scalar Spark output columns here so
            # that class of gate-schema bug can never ship again.
            bad = nonscalar_spark_cols(sdf.schema)
            if bad:
                print(
                    f"FAIL  {name}: non-scalar output columns {bad} — the "
                    f"driver canonicalizer cannot hash them; flatten "
                    f"(array_join / e0..eN projection) before gating"
                )
                failures.append(name)
                continue
            s_rows = [tuple(r) for r in sdf.collect()]
            s_n, s_h = table_hash(s_cols, s_rows)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        t1 = time.time()
        if name not in oracles:
            print(f"OK?   {name}: rows={s_n} (no oracle, rows-only) spark={t1-t0:.1f}s")
            continue
        try:
            rel = con.sql(oracles[name])
            d_cols = rel.columns
            # The driver fetches DuckDB results via Arrow, under which HUGEINT
            # exports as float64 (hashing "3.0" != "3") while NULLs survive as
            # None (a plain pandas fetchdf would turn them into NaN — that
            # combination is the only one consistent with round-1 results).
            # Replicate that path AND hard-fail on any implicitly-widened
            # oracle column so the class of bug can't recur.
            loose = [
                (c, str(t))
                for c, t in zip(rel.columns, rel.types)
                if "HUGEINT" in str(t).upper() or "DECIMAL" in str(t).upper()
            ]
            if loose:
                print(f"FAIL  {name}: oracle emits untyped columns {loose} "
                      f"(cast to BIGINT/DOUBLE explicitly)")
                failures.append(name)
                continue
            # Mirror of the Spark-side non-scalar hard-fail: the driver
            # canonicalizer can't hash DuckDB LIST/STRUCT/MAP either.
            nested = nonscalar_duckdb_cols(rel.columns, rel.types)
            if nested:
                print(f"FAIL  {name}: oracle emits non-scalar columns {nested} "
                      f"(array_to_string before gating)")
                failures.append(name)
                continue
            d_tbl = rel.fetch_arrow_table()
            d_pylist = d_tbl.to_pylist()
            d_rows = [tuple(row[c] for c in d_cols) for row in d_pylist]
            d_n, d_h = table_hash(d_cols, d_rows)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {str(e)[:300]}")
            failures.append(name)
            continue
        t2 = time.time()
        status = "OK" if (s_n, s_h) == (d_n, d_h) and sorted(s_cols) == sorted(d_cols) else "FAIL"
        print(
            f"{status:5s} {name}: spark rows={s_n} hash={s_h} ({t1-t0:.1f}s) | "
            f"duckdb rows={d_n} hash={d_h} ({t2-t1:.1f}s) cols "
            f"{'match' if sorted(s_cols)==sorted(d_cols) else f'{sorted(s_cols)} vs {sorted(d_cols)}'}"
        )
        if status == "FAIL":
            failures.append(name)
            if s_n == d_n and sorted(s_cols) == sorted(d_cols):
                order = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
                s_set = sorted("\x1f".join(canon(r[i]) for i in order) for r in s_rows)
                d_order = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
                d_set = sorted("\x1f".join(canon(r[i]) for i in d_order) for r in d_rows)
                diffs = [
                    (a, b) for a, b in zip(s_set, d_set) if a != b
                ][:3]
                for a, b in diffs:
                    print(f"      spark : {a[:160]}")
                    print(f"      duckdb: {b[:160]}")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
