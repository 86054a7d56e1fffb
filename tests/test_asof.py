"""asof_join semantics: backward match, equal-ts inclusivity, null
when no earlier version, tolerance, same-ts version tiebreak, and
input validation."""

import pytest

from linear_quadtree_spark.operators.asof import asof_join

VERSIONS = [
    ("a", 100, "a-v0"),
    ("a", 200, "a-v1"),
    ("b", 150, "b-v0"),
]


def _dfs(spark, probes):
    p = spark.createDataFrame(probes, "k: string, pid: long, pts: long")
    v = spark.createDataFrame(VERSIONS, "k: string, vts: long, payload: string")
    return p, v


def _run(spark, probes, **kw):
    p, v = _dfs(spark, probes)
    out = asof_join(p, v, key_cols=["k"], probe_ts_col="pts",
                    version_ts_col="vts", payload_cols=["payload"], **kw)
    return {r.pid: (r.matched_ts, r.payload) for r in out.collect()}


def test_backward_match_and_nulls(spark):
    got = _run(spark, [
        ("a", 0, 99),    # before any version -> null
        ("a", 1, 100),   # equal ts -> inclusive
        ("a", 2, 150),   # between versions -> v0
        ("a", 3, 500),   # after all -> v1
        ("b", 4, 160),
        ("c", 5, 400),   # key with no versions -> null
    ])
    assert got == {
        0: (None, None),
        1: (100, "a-v0"),
        2: (100, "a-v0"),
        3: (200, "a-v1"),
        4: (150, "b-v0"),
        5: (None, None),
    }


def test_tolerance_nulls_stale_matches(spark):
    got = _run(spark, [("a", 0, 210), ("a", 1, 290)], tolerance_s=50)
    assert got == {0: (200, "a-v1"), 1: (None, None)}


def test_same_ts_version_tiebreak(spark):
    p = [("a", 0, 300)]
    pdf = list(p)
    for hi_first in (False, True):
        vs = [("a", 250, "x"), ("a", 250, "z")]
        if hi_first:
            vs.reverse()
        pdfk, _ = _dfs(spark, pdf)
        v = spark.createDataFrame(vs, "k: string, vts: long, payload: string")
        out = asof_join(pdfk, v, ["k"], "pts", "vts", ["payload"],
                        version_tiebreak="payload")
        assert [r.payload for r in out.collect()] == ["z"]


def test_validation(spark):
    p, v = _dfs(spark, [("a", 0, 1)])
    with pytest.raises(ValueError):
        asof_join(p, v, ["k"], "missing", "vts", ["payload"])
    with pytest.raises(ValueError):
        asof_join(p, v, ["k"], "pts", "vts", ["nope"])
    with pytest.raises(ValueError):
        asof_join(p.withColumnRenamed("pid", "payload"), v, ["k"], "pts",
                  "vts", ["payload"])


# ------------------------------------------------- property: pandas twin
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@st.composite
def _asof_case(draw):
    keys = ["a", "b", "c"]
    n_v = draw(st.integers(1, 12))
    n_p = draw(st.integers(1, 12))
    vts = draw(
        st.lists(
            st.tuples(st.sampled_from(keys), st.integers(0, 50)),
            min_size=n_v, max_size=n_v, unique=True,  # unique (k, ts)
        )
    )
    probes = draw(
        st.lists(
            st.tuples(st.sampled_from(keys), st.integers(0, 60)),
            min_size=n_p, max_size=n_p,
        )
    )
    return vts, probes


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(_asof_case())
def test_asof_matches_pandas_merge_asof(spark, case):
    """Independent third-engine cross-check: pandas merge_asof
    (direction='backward', exact matches allowed) on random inputs."""
    vts, probes = case
    v = spark.createDataFrame(
        [(k, t, f"{k}@{t}") for k, t in vts], "k: string, vts: long, payload: string"
    )
    p = spark.createDataFrame(
        [(k, i, t) for i, (k, t) in enumerate(probes)],
        "k: string, pid: long, pts: long",
    )
    got = {
        r.pid: (r.matched_ts, r.payload)
        for r in asof_join(p, v, ["k"], "pts", "vts", ["payload"]).collect()
    }
    pv = pd.DataFrame([(k, t, f"{k}@{t}") for k, t in vts],
                      columns=["k", "ts", "payload"]).sort_values("ts")
    pp = pd.DataFrame([(k, i, t) for i, (k, t) in enumerate(probes)],
                      columns=["k", "pid", "ts"]).sort_values("ts")
    m = pd.merge_asof(pp, pv, on="ts", by="k", direction="backward",
                      suffixes=("", "_v"))
    for _, row in m.iterrows():
        # matched_ts is the VERSION's ts; recover it from the payload tag
        if isinstance(row["payload"], str):
            want = (int(row["payload"].split("@")[1]), row["payload"])
        else:
            want = (None, None)
        assert got[int(row["pid"])] == want, (row.to_dict(), got[int(row["pid"])])
