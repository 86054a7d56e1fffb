"""C4-style line-level dedup (operators/clean.py line_dedup):
cross-engine identity on the fixture corpus plus semantic edge cases
on a hand-built corpus where the right answer is computable by hand.
"""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from linear_quadtree_spark.operators.clean import (
    line_dedup,
    line_dedup_sql_duck,
)


def test_line_dedup_matches_duck_on_fixture(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = line_dedup(docs).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    exp = con.execute(line_dedup_sql_duck()).fetchdf()
    assert got.iloc[0].to_dict() == exp.iloc[0].to_dict()
    # non-degenerate on the fixture: boilerplate exists and is removed
    assert int(got["n_lines_removed"].iloc[0]) > 0
    assert int(got["n_boilerplate_lines"].iloc[0]) > 0
    assert int(got["n_docs_changed"].iloc[0]) > 0


def _hand_corpus(spark):
    w8 = " ".join(f"w{i}" for i in range(8))  # the shared boilerplate line
    rows = [
        # three docs share the SAME first 8-word chunk -> removed
        (0, w8 + " alpha beta gamma delta epsilon zeta eta theta"),
        (1, w8 + " one two three four five six seven eight"),
        (2, w8 + " ichi ni san shi go roku nana hachi"),
        # a doc with the shared chunk NOT chunk-aligned -> kept (C4
        # removes the line unit, and our unit is the aligned chunk)
        (3, "pre " + w8 + " tail2 tail3 tail4 tail5 tail6 tail7 tail8"),
        # short doc: fewer than 8 words -> zero lines, never counted
        (4, "tiny doc"),
        # doc made ONLY of the boilerplate line -> rebuilt empty
        (5, w8),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_line_dedup_hand_corpus(spark):
    audit = line_dedup(_hand_corpus(spark), min_docs=3).toPandas().iloc[0]
    # docs with >= 1 line: 0,1,2,3,5 (doc 4 has zero lines)
    assert audit["n_docs"] == 5
    # lines: docs 0-3 have 2 each, doc 5 has 1 -> 9
    assert audit["n_lines"] == 9
    # the aligned shared chunk appears in docs 0,1,2,5 -> 1 boilerplate
    # line removed 4 times; doc 3's copy is unaligned and survives
    assert audit["n_boilerplate_lines"] == 1
    assert audit["n_lines_removed"] == 4
    assert audit["n_docs_changed"] == 4
    con = duckdb.connect()
    pdf = _hand_corpus(spark).toPandas()
    con.register("documents", pdf)
    exp = con.execute(line_dedup_sql_duck()).fetchdf().iloc[0]
    assert audit.to_dict() == exp.to_dict()


def test_line_dedup_threshold_monotone(spark):
    """Raising min_docs can only shrink the removed set."""
    docs = _hand_corpus(spark)
    r3 = line_dedup(docs, min_docs=3).toPandas().iloc[0]
    r4 = line_dedup(docs, min_docs=4).toPandas().iloc[0]
    r5 = line_dedup(docs, min_docs=5).toPandas().iloc[0]
    assert r3["n_lines_removed"] >= r4["n_lines_removed"]
    # the shared chunk sits in exactly 4 docs: gone at 5, present at 4
    assert r4["n_lines_removed"] == 4
    assert r5["n_lines_removed"] == 0
    assert r5["n_docs_changed"] == 0


def test_line_dedup_plan_shape(spark):
    """Scale contract: ONE exchange for the line-frequency aggregate,
    ONE for the per-doc rebuild, broadcast for the dup set — no
    sort-merge join, no cartesian."""
    plan = line_dedup(_hand_corpus(spark))._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
