"""group_quantiles: ground truth vs Python, duplicates and singletons,
quantile_disc parity fuzz, and the two-exchange distinct-sized plan."""

import random

import duckdb

from linear_quadtree_spark.operators.quantiles import (
    group_quantiles,
    group_quantiles_sql_duck,
    q_col_name,
)


def test_small_ground_truth(spark):
    df = spark.createDataFrame(
        [("a", v) for v in [10, 20, 30, 40]]
        + [("b", v) for v in [10, 20, 30, 40, 50]]
        + [("c", 7)],
        "g: string, v: long",
    )
    got = {r.g: r for r in group_quantiles(df, ["g"], "v").collect()}
    assert (got["a"].n_rows, got["a"].p50, got["a"].p90, got["a"].p99) == (4, 20, 40, 40)
    assert (got["b"].n_rows, got["b"].p50, got["b"].p90, got["b"].p99) == (5, 30, 50, 50)
    assert (got["c"].n_rows, got["c"].p50, got["c"].p90, got["c"].p99) == (1, 7, 7, 7)


def test_duplicates_counted(spark):
    # 9 copies of 1 and one 100: p50 = 1, p99 = 100 (rank ceil(9.9)=10)
    df = spark.createDataFrame(
        [("g", 1)] * 9 + [("g", 100)], "g: string, v: long"
    )
    r = group_quantiles(df, ["g"], "v", qs=(0.5, 0.9, 0.99)).collect()[0]
    assert (r.n_rows, r.p50, r.p90, r.p99) == (10, 1, 1, 100)


def test_fuzz_vs_quantile_disc(spark):
    rng = random.Random(13)
    rows = []
    for gi in range(12):
        n = rng.randint(1, 60)
        rows += [(f"g{gi}", rng.randint(0, 25)) for _ in range(n)]
    df = spark.createDataFrame(rows, "g: string, v: long")
    qs = (0.5, 0.9, 0.99, 0.25, 1.0)
    got = sorted(tuple(r) for r in group_quantiles(df, ["g"], "v", qs=qs).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE t(g VARCHAR, v BIGINT)")
    con.executemany("INSERT INTO t VALUES (?,?)", rows)
    exp = sorted(map(tuple, con.execute(
        group_quantiles_sql_duck("t", ["g"], "v", qs=qs)).fetchall()))
    assert got == exp


def test_col_names():
    assert q_col_name(0.5) == "p50"
    assert q_col_name(0.99) == "p99"
    assert q_col_name(0.999) == "p99_9"
    assert q_col_name(1.0) == "p100"


def test_two_exchanges_max(spark):
    df = spark.createDataFrame(
        [("g", v % 7) for v in range(100)], "g: string, v: long"
    )
    plan = (
        group_quantiles(df, ["g"], "v")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # shuffle 1 on (g, v) histogram, shuffle 2 on g for the window; the
    # final aggregate reuses the window's partitioning
    assert plan.count("Exchange hashpartitioning") <= 2
