"""Local mimic of the driver's correctness gate.

Runs every ``queries()`` entry at sf0.01 and compares against
``oracle_sql()`` via DuckDB: row count, sorted column names, and an
order-insensitive value comparison (exact for ints/strings, bitwise-first
then tolerance-reported for floats so parity regressions are visible).

Usage: python tools/check.py [sf_dir] [query_name ...]

Set ``CHECK_JSON_OUT=/path/to/file.json`` to also record the run as a
diffable artifact: ``{"sf_dir": ..., "results": {name: {"status":
"pass"|"pass_rows_only"|"fail", "rows": N, "wall_spark_s": ...,
"problems": [...]}}}`` — the per-round ``CHECKLOCAL_r{N}.json`` record of
the entries the driver's 50-sample gate didn't cover.
"""

from __future__ import annotations

import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    return sorted(out, key=lambda t: tuple((str(type(v)), str(v)) for v in t))


def compare(name, spark_rows, spark_cols, duck_rows, duck_cols):
    problems = []
    if sorted(spark_cols) != sorted(duck_cols):
        problems.append(f"schema mismatch: spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
        return problems
    if len(spark_rows) != len(duck_rows):
        problems.append(f"rowcount mismatch: spark={len(spark_rows)} duck={len(duck_rows)}")
    a, b = canon(spark_rows, spark_cols), canon(duck_rows, duck_cols)
    n = min(len(a), len(b))
    max_float_diff = 0.0
    mismatches = 0
    for i in range(n):
        ra, rb = a[i], b[i]
        for va, vb in zip(ra, rb):
            if isinstance(va, float) and isinstance(vb, float):
                if va != vb:
                    d = abs(va - vb)
                    max_float_diff = max(max_float_diff, d)
                    if not math.isclose(va, vb, rel_tol=1e-9, abs_tol=1e-12):
                        mismatches += 1
            elif va != vb:
                mismatches += 1
                if mismatches <= 3:
                    problems.append(f"  value mismatch row {i}: {ra} vs {rb}")
    if mismatches:
        problems.append(f"{mismatches} mismatched values (max float diff {max_float_diff:g})")
    elif max_float_diff > 0:
        problems.append(f"NOTE: floats not bitwise equal, max diff {max_float_diff:g} (within tol)")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and os.path.isdir(sys.argv[1]) else "/root/testdata/sf0.01"
    only = set(a for a in sys.argv[1:] if not os.path.isdir(a))

    import duckdb

    import __spark_entry__ as entry

    if os.environ.get("SPARK_GRAFT_PLAIN"):
        # driver simulation: a vanilla session with none of our configs —
        # queries must set what they need at runtime
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]").appName("check-plain")
            .config("spark.ui.enabled", "false").getOrCreate()
        )
    else:
        from next_plaid_spark.session import get_spark

        spark = get_spark("check")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, oracles = entry.queries(), entry.oracle_sql()
    failed = []
    record = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spark_cols = sdf.columns
            spark_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failed.append(name)
            record[name] = {"status": "fail", "rows": None,
                            "wall_spark_s": round(time.time() - t0, 2),
                            "problems": [f"spark error: {e}"]}
            continue
        # schema guard: the driver's canonicalizer sorts all columns with
        # pandas sort_values, which crashes on unhashable cells — an
        # array/map/struct column ships a guaranteed-red gate row even when
        # values are correct (the r6 media_features failure class). Catch it
        # at authoring time; array-returning APIs keep their pytest gates
        # and explode/hash to scalars in the gate entry.
        from pyspark.sql import types as _T

        bad = [
            f.name for f in sdf.schema.fields
            if isinstance(f.dataType, (_T.ArrayType, _T.MapType, _T.StructType))
        ]
        if bad:
            print(
                f"FAIL {name}: gate-incompatible column(s) {bad} — "
                "array/map/struct break the driver canonicalizer; "
                "explode or hash to scalar columns"
            )
            failed.append(name)
            record[name] = {"status": "fail", "rows": len(spark_rows),
                            "wall_spark_s": round(time.time() - t0, 2),
                            "problems": [f"gate-incompatible column(s) {bad}"]}
            continue
        t1 = time.time()
        if name not in oracles:
            print(f"PASS(rows-only) {name}: {len(spark_rows)} rows [{t1-t0:.1f}s]")
            record[name] = {"status": "pass_rows_only", "rows": len(spark_rows),
                            "wall_spark_s": round(t1 - t0, 2), "problems": []}
            continue
        try:
            res = con.execute(oracles[name])
            duck_cols = [d[0] for d in res.description]
            duck_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failed.append(name)
            record[name] = {"status": "fail", "rows": len(spark_rows),
                            "wall_spark_s": round(t1 - t0, 2),
                            "problems": [f"duckdb error: {e}"]}
            continue
        problems = compare(name, spark_rows, spark_cols, duck_rows, duck_cols)
        hard = [p for p in problems if not p.startswith("NOTE")]
        # dtype guard: the driver's value hash is order-insensitive and
        # integer-width-tolerant, but an un-cast DuckDB sum() widens to
        # HUGEINT → arrow decimal128, which hash-mismatches Spark's BIGINT
        # even when values are equal (the r5 pack_sequences/span_corrupt
        # failure class). Catch it here, at authoring time.
        try:
            atbl = con.execute(
                f"SELECT * FROM ({oracles[name]}) LIMIT 1"
            ).fetch_arrow_table()
            dec = [f.name for f in atbl.schema if "decimal" in str(f.type)]
            if dec:
                problems.append(
                    f"oracle emits decimal128 column(s) {dec} — CAST to "
                    "BIGINT/DOUBLE or the driver hash will mismatch"
                )
                hard.append(problems[-1])
        except Exception:
            pass
        status = "FAIL" if hard else "PASS"
        if hard:
            failed.append(name)
        print(f"{status} {name}: {len(spark_rows)} rows [spark {t1-t0:.1f}s, duck {time.time()-t1:.1f}s]")
        for p in problems:
            print(f"    {p}")
        record[name] = {"status": status.lower(), "rows": len(spark_rows),
                        "wall_spark_s": round(t1 - t0, 2),
                        "wall_duck_s": round(time.time() - t1, 2),
                        "problems": problems}
    print()
    print(f"{'ALL PASS' if not failed else 'FAILURES: ' + ', '.join(failed)}")
    out_path = os.environ.get("CHECK_JSON_OUT")
    if out_path:
        import json

        with open(out_path, "w") as fh:
            json.dump({"sf_dir": sf_dir,
                       "n_entries": len(record),
                       "n_fail": len(failed),
                       "results": record}, fh, indent=1, sort_keys=True)
        print(f"wrote {out_path} ({len(record)} entries, {len(failed)} failures)")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
