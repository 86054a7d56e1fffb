"""path_rollup: prefix pyramid semantics (parent = union of children),
root/empty-path handling, max_depth truncation, DuckDB lockstep, and
the single-shuffle plan."""

import duckdb

from linear_quadtree_spark.operators.pathroll import (
    path_rollup,
    path_rollup_sql_duck,
)

PAGES = [
    ("h1", "https://h1/a/b/c"),
    ("h1", "https://h1/a/b"),
    ("h1", "https://h1/a/x"),
    ("h1", "https://h1/"),
    ("h2", "https://h2"),
    ("h2", "https://h2/docs/api/v1/ref"),
]


def _df(spark):
    return spark.createDataFrame(PAGES, "host: string, url: string")


def test_pyramid_counts(spark):
    got = {
        (r.host, r.prefix): (r.depth, r.n_pages)
        for r in path_rollup(_df(spark), host_col="host", max_depth=3).collect()
    }
    assert got[("h1", "/a")] == (1, 3)
    assert got[("h1", "/a/b")] == (2, 2)
    assert got[("h1", "/a/b/c")] == (3, 1)
    assert got[("h1", "/a/x")] == (2, 1)
    assert got[("h1", "/")] == (0, 1)        # bare path
    assert got[("h2", "/")] == (0, 1)        # no path at all
    assert got[("h2", "/docs/api/v1")] == (3, 1)  # max_depth truncation
    assert ("h2", "/docs/api/v1/ref") not in got


def test_parent_is_union_of_children(spark):
    rows = path_rollup(_df(spark), host_col="host", max_depth=3).collect()
    by_host = {}
    for r in rows:
        by_host.setdefault(r.host, []).append(r)
    for host, rs in by_host.items():
        idx = {r.prefix: r.n_pages for r in rs}
        for r in rs:
            if r.depth == 0:
                continue
            kids = [
                p for p in idx
                if p.startswith(r.prefix + "/") and p.count("/") == r.prefix.count("/") + 1
            ]
            # parent count >= sum of children (pages can END at the parent)
            assert idx[r.prefix] >= sum(idx[k] for k in kids)


def test_no_host_grouping(spark):
    rows = path_rollup(_df(spark), max_depth=2).collect()
    got = {r.prefix: r.n_pages for r in rows}
    assert got["/a"] == 3 and got["/a/b"] == 2 and got["/docs"] == 1


def test_duckdb_lockstep(spark):
    got = sorted(
        tuple(r)
        for r in path_rollup(_df(spark), host_col="host", max_depth=4).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE p(host VARCHAR, url VARCHAR)")
    con.executemany("INSERT INTO p VALUES (?,?)", PAGES)
    exp = sorted(map(tuple, con.execute(
        path_rollup_sql_duck("p", host_col="host", max_depth=4)).fetchall()))
    assert got == exp


def test_single_shuffle(spark):
    plan = (
        path_rollup(_df(spark), host_col="host")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
