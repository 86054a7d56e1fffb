"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB at sf0.01, compare
row-count + schema + order-insensitive values. Exit 1 on any mismatch.

Also a TYPE-EXACTNESS harness (`--types`): the driver's value hash is
sensitive to the fetched dtype (a DuckDB HUGEINT window-sum hashes
differently from a Spark BIGINT even when every value is equal), while
the local pandas comparison is not (`check_dtype=False`). So we compare
the DuckDB relation's declared types (pre-fetch, pre-normalization)
against the Spark schema per query and FAIL on any family/width drift —
HUGEINT leaks from SUM()/window-SUM//`//`, uncast literals, DECIMAL
scale drift. Both sides bind lazily, so the full-registry sweep costs
seconds. The normal value-check path runs the same type gate per query.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod  # noqa: E402
from linear_quadtree_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _canon_spark(t) -> tuple:
    """Canonical type family for a Spark DataType (hash-relevant only)."""
    s = t.simpleString()
    if s.startswith("decimal("):
        p, sc = s[8:-1].split(",")
        return ("dec", int(sc))
    if s.startswith("array<"):
        import pyspark.sql.types as T

        assert isinstance(t, T.ArrayType)
        return ("arr",) + _canon_spark(t.elementType)
    return {
        "bigint": ("int", 64), "int": ("int", 32),
        "smallint": ("int", 16), "tinyint": ("int", 8),
        "double": ("float", 64), "float": ("float", 32),
        "string": ("str",), "boolean": ("bool",),
        "date": ("date",), "timestamp": ("ts",),
        "timestamp_ntz": ("ts",), "binary": ("bin",),
    }.get(s, ("other", s))


def _canon_duck(t) -> tuple:
    """Canonical type family for a DuckDB type (str(DuckDBPyType))."""
    s = str(t).upper()
    if s.endswith("[]"):
        return ("arr",) + _canon_duck(s[:-2])
    if s.startswith("DECIMAL("):
        p, sc = s[8:-1].split(",")
        return ("dec", int(sc))
    return {
        "BIGINT": ("int", 64), "INTEGER": ("int", 32), "INT": ("int", 32),
        "SMALLINT": ("int", 16), "TINYINT": ("int", 8),
        "HUGEINT": ("int", 128), "UBIGINT": ("uint", 64),
        "UINTEGER": ("uint", 32), "DOUBLE": ("float", 64),
        "FLOAT": ("float", 32), "REAL": ("float", 32),
        "VARCHAR": ("str",), "BOOLEAN": ("bool",), "DATE": ("date",),
        "TIMESTAMP": ("ts",), "TIMESTAMP WITH TIME ZONE": ("ts",),
        "TIMESTAMP_NS": ("ts",), "TIMESTAMP_MS": ("ts",),
        "BLOB": ("bin",),
    }.get(s, ("other", s))


def type_drift(spark_df, con, sql: str) -> list[str]:
    """Return per-column canonical-type mismatches between a (lazy)
    Spark plan and a (lazy) DuckDB relation — the driver-hash-visible
    drift class. Empty list == type-exact."""
    rel = con.sql(sql)
    sp = {f.name: _canon_spark(f.dataType) for f in spark_df.schema.fields}
    du = dict(zip(rel.columns, (_canon_duck(t) for t in rel.types)))
    if sorted(sp) != sorted(du):
        return [f"columns {sorted(sp)} vs {sorted(du)}"]
    drift = []
    for c in sorted(sp):
        if sp[c] == du[c]:
            continue
        if sp[c][0] == "other" and du[c][0] == "other":
            # unmapped family (struct/map/interval/...): the two engines
            # SPELL types differently, so inequality here proves nothing —
            # warn for a manual look instead of hard-failing a query whose
            # values may hash identically
            print(f"    WARNING {c}: unmapped type family, not comparable —"
                  f" spark {sp[c][1]} vs duckdb {du[c][1]}")
            continue
        drift.append(f"{c}: spark {sp[c]} vs duckdb {du[c]}")
    return drift


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--types"]
    types_only = "--types" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:]) or None
    spark = get_spark(
        app_name="check-oracles", master="local[8]", shuffle_partitions=16,
        extra_conf={"spark.ui.enabled": "false"},
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if types_only:
            if name not in oracles:
                print(f"  {name}: rows-only (no oracle — type check n/a)")
                continue
            try:
                drift = type_drift(fn(spark, sf_dir), con, oracles[name])
            except Exception as ex:  # noqa: BLE001
                drift = [f"bind error: {type(ex).__name__}: {str(ex)[:200]}"]
            if drift:
                failures.append(name)
                print(f"  {name}: TYPE DRIFT — {'; '.join(drift)}")
            else:
                print(f"  {name}: types OK")
            continue
        t0 = time.time()
        spark_df = fn(spark, sf_dir)
        got = spark_df.toPandas()
        t1 = time.time()
        if name not in oracles:
            print(f"  {name}: rows-only ({len(got)} rows, {t1-t0:.1f}s spark)")
            continue
        exp = con.execute(oracles[name]).fetch_df()
        g, e = normalize(got), normalize(exp)
        status = []
        drift = type_drift(spark_df, con, oracles[name])
        if drift:
            status.append(f"TYPES {'; '.join(drift)}")
        if len(g) != len(e):
            status.append(f"ROWCOUNT {len(g)} vs {len(e)}")
        if list(g.columns) != list(e.columns):
            status.append(f"COLS {list(g.columns)} vs {list(e.columns)}")
        if not status:
            try:
                pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=True)
            except AssertionError as ex:
                status.append(f"VALUES: {str(ex)[:300]}")
        if status:
            failures.append(name)
            print(f"  {name}: FAIL — {'; '.join(status)}")
        else:
            print(f"  {name}: OK ({len(g)} rows, {t1-t0:.1f}s spark, {time.time()-t1:.1f}s duckdb)")
    spark.stop()
    if failures:
        print("FAILURES:", failures)
        return 1
    print("ALL ORACLE CHECKS PASSED")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
