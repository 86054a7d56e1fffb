"""range_lookup correctness: inclusive bounds, gaps, bucket-spanning
carry-over, randomized equivalence to a brute-force containment check,
and the no-join single-exchange plan shape."""

import random

from pyspark.sql import functions as F

from linear_quadtree_spark.operators.lookup import range_lookup

RANGES = [
    # (start, end, asn) — non-overlapping, gaps between them; the middle
    # interval spans several bucket_bits=4 buckets (width 16)
    (10, 19, 100),
    (40, 99, 200),
    (120, 120, 300),
]


def _fixture(spark):
    facts = spark.createDataFrame(
        [(i, v) for i, v in enumerate([0, 9, 10, 15, 19, 20, 39, 40, 99,
                                       100, 119, 120, 121, 500])],
        "fid: long, v: long",
    )
    ranges = spark.createDataFrame(RANGES, "lo: long, hi: long, asn: long")
    return facts, ranges


def _truth(v):
    for lo, hi, asn in RANGES:
        if lo <= v <= hi:
            return (lo, asn)
    return (None, None)


def test_ground_truth_all_paths(spark):
    facts, ranges = _fixture(spark)
    got = {
        r.fid: (r.matched_start, r.asn)
        for r in range_lookup(facts, ranges, "v", "lo", "hi", ["asn"],
                              bucket_bits=4).collect()
    }
    exp = {r.fid: _truth(r.v) for r in facts.collect()}
    assert got == exp


def test_fact_columns_preserved(spark):
    facts, ranges = _fixture(spark)
    out = range_lookup(facts, ranges, "v", "lo", "hi", ["asn"], bucket_bits=4)
    assert set(out.columns) == {"fid", "v", "matched_start", "asn"}
    assert out.count() == facts.count()


def test_fuzz_vs_bruteforce(spark):
    rng = random.Random(7)
    # 60 non-overlapping intervals with random gaps over [0, ~6000)
    ranges, cur = [], 0
    for i in range(60):
        cur += rng.randint(1, 40)  # gap
        lo = cur
        cur += rng.randint(0, 120)  # width (0 = singleton)
        ranges.append((lo, cur, 1000 + i))
        cur += 1
    vals = [rng.randint(-10, cur + 50) for _ in range(800)]

    def truth(v):
        for lo, hi, p in ranges:
            if lo <= v <= hi:
                return (lo, p)
        return (None, None)

    facts = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "fid: long, v: long"
    )
    rdf = spark.createDataFrame(ranges, "lo: long, hi: long, p: long")
    got = {
        r.fid: (r.matched_start, r.p)
        for r in range_lookup(facts, rdf, "v", "lo", "hi", ["p"],
                              bucket_bits=6).collect()
    }
    assert got == {i: truth(v) for i, v in enumerate(vals)}


def test_plan_has_no_join_and_one_exchange(spark):
    # the whole point: a range predicate that would compile to
    # BroadcastNestedLoopJoin as a join is instead ONE hash exchange on
    # the bucket feeding a window — no join operator at any scale
    facts, ranges = _fixture(spark)
    plan = (
        range_lookup(facts, ranges, "v", "lo", "hi", ["asn"], bucket_bits=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, plan


def test_validation_errors(spark):
    facts, ranges = _fixture(spark)
    try:
        range_lookup(facts.withColumnRenamed("v", "asn"), ranges,
                     "asn", "lo", "hi", ["asn"])
        raise AssertionError("clash not detected")
    except ValueError:
        pass
    try:
        range_lookup(facts, ranges, "missing", "lo", "hi", ["asn"])
        raise AssertionError("missing column not detected")
    except ValueError:
        pass
