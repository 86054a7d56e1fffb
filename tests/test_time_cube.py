"""tile_time_cube: the ROLLUP result must equal the UNION of the three
explicit groupBys (grain by grain), and the plan must lower to ONE
Expand feeding hash aggregates — three granularities, one declared
pass, never three scans of the events relation."""

import pyspark.sql.functions as F

from linear_quadtree_spark.operators.spacetime import tile_time_cube


def _events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def test_cube_equals_explicit_grains(spark, sf_dir):
    ev = _events(spark, sf_dir)
    out = tile_time_cube(ev, zoom=4).collect()
    by_gid = {}
    for r in out:
        by_gid.setdefault(r["gid"], {})
    assert set(by_gid) == {0, 1, 3}

    from linear_quadtree_spark.operators.spacetime import _with_keys
    from linear_quadtree_spark.config import DEFAULT_BOUNDS

    keyed = _with_keys(ev, 4, DEFAULT_BOUNDS, "event_id", "ts")
    d = keyed.select(
        "tile",
        F.expr("((CAST(unix_timestamp(ts) AS BIGINT) div 86400) + 4) % 7").alias("dow"),
        F.hour("ts").cast("int").alias("hour"),
        "user_id",
        "value",
    )
    grains = {
        0: ["tile", "dow", "hour"],
        1: ["tile", "dow"],
        3: ["tile"],
    }
    for gid, cols in grains.items():
        exp = {
            tuple(r[c] for c in cols): (r["n"], r["u"], r["m"])
            for r in d.groupBy(*cols)
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.countDistinct("user_id").alias("u"),
                F.max("value").alias("m"),
            )
            .collect()
        }
        got = {
            tuple(r[c] for c in cols): (r["n_events"], r["n_users"], r["max_value"])
            for r in out
            if r["gid"] == gid
        }
        assert got == exp, f"grain {gid}"


def test_cube_dow_is_portable_epoch_formula(spark, sf_dir):
    """dow must be 0..6 with 0 = Sunday (1970-01-05 was a Monday)."""
    df = spark.sql(
        "SELECT ((CAST(unix_timestamp(TIMESTAMP'1970-01-05 10:00:00') AS BIGINT)"
        " div 86400) + 4) % 7 AS dow"
    )
    assert df.first()["dow"] == 1  # Monday
    ev = _events(spark, sf_dir)
    rows = tile_time_cube(ev, zoom=4).filter("gid = 1").select("dow").distinct().collect()
    assert {r["dow"] for r in rows} <= set(range(7))


def test_cube_plan_has_one_expand_one_scan(spark, sf_dir):
    ev = _events(spark, sf_dir)
    plan = tile_time_cube(ev, zoom=4)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Expand") >= 1
    # one scan of the events relation: the rollup must not union three
    # separate aggregations of the source
    assert plan.count("Scan parquet") == 1
