"""resolve_redirects: chain resolution with exact hop counts, cycle
detection (pure cycles and tails flowing into cycles), convergence
round bound, and DuckDB recursive-walk lockstep."""

import duckdb

from linear_quadtree_spark.operators.redirects import (
    resolve_redirects,
    resolve_redirects_sql_duck,
)

EDGES = [
    # chain a->b->c->d (d terminal)
    ("a", "b"), ("b", "c"), ("c", "d"),
    # 3-cycle x->y->z->x
    ("x", "y"), ("y", "z"), ("z", "x"),
    # tail t1->t2 flowing into the cycle
    ("t1", "t2"), ("t2", "x"),
    # self-loop
    ("s", "s"),
    # direct hop
    ("q", "final"),
]


def _df(spark):
    return spark.createDataFrame(EDGES, "src_url: string, dst_url: string")


def test_chains_and_cycles(spark):
    got = {r.src_url: r for r in resolve_redirects(_df(spark)).collect()}
    assert (got["a"].final_url, got["a"].hops, got["a"].is_cycle) == ("d", 3, 0)
    assert (got["b"].final_url, got["b"].hops) == ("d", 2)
    assert (got["c"].final_url, got["c"].hops) == ("d", 1)
    assert (got["q"].final_url, got["q"].hops) == ("final", 1)
    for u in ("x", "y", "z", "s", "t1", "t2"):
        r = got[u]
        assert (r.final_url, r.hops, r.is_cycle) == (None, None, 1), u
    assert len(got) == len(EDGES)


def test_duplicate_edges_min_dst_wins(spark):
    df = spark.createDataFrame(
        [("u", "zz"), ("u", "aa")], "src_url: string, dst_url: string"
    )
    r = resolve_redirects(df).collect()
    assert len(r) == 1 and r[0].final_url == "aa" and r[0].hops == 1


def test_long_chain_log_rounds(spark):
    # 64-hop chain resolves within the doubling bound and exact hops
    edges = [(f"n{i}", f"n{i+1}") for i in range(64)]
    df = spark.createDataFrame(edges, "src_url: string, dst_url: string")
    got = {r.src_url: r for r in resolve_redirects(df, max_chain=64).collect()}
    assert got["n0"].final_url == "n64" and got["n0"].hops == 64
    assert got["n63"].hops == 1
    assert all(r.is_cycle == 0 for r in got.values())


def test_duckdb_lockstep(spark):
    got = sorted(tuple(r) for r in resolve_redirects(_df(spark)).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE e(src_url VARCHAR, dst_url VARCHAR)")
    con.executemany("INSERT INTO e VALUES (?,?)", EDGES)
    exp = sorted(map(tuple, con.execute(
        "WITH RECURSIVE " + resolve_redirects_sql_duck("e")).fetchall()))
    assert got == exp
