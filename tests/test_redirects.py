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


def test_canonical_url_vectors(spark):
    """Hand vectors for the query canonicalizer: fragment dropped,
    tracking params stripped, surviving params SORTED, '?' dropped when
    nothing survives — identical text in both engines."""
    import duckdb

    from linear_quadtree_spark.functions.textexpr import DUCK, SPARK
    from linear_quadtree_spark.operators.crawl import canonical_url_expr
    from pyspark.sql import functions as F

    vectors = [
        ("https://a.b/p?z=2&a=1", "https://a.b/p?a=1&z=2"),
        ("https://a.b/p?utm_source=x&a=1#frag", "https://a.b/p?a=1"),
        ("https://a.b/p?utm_source=x&gclid=1", "https://a.b/p"),
        ("https://a.b/p", "https://a.b/p"),
        ("https://a.b/p#only-frag", "https://a.b/p"),
        ("https://a.b/p?sessionid=9&b=2&a=1", "https://a.b/p?a=1&b=2"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in vectors], "url string")
    got = [
        r.c
        for r in df.select(
            F.expr(canonical_url_expr(SPARK, "url")).alias("c")
        ).collect()
    ]
    assert got == [c for _, c in vectors]
    con = duckdb.connect()
    for u, c in vectors:
        (d,) = con.execute(
            f"SELECT {canonical_url_expr(DUCK, chr(39) + u + chr(39))}"
        ).fetchone()
        assert d == c, u


def test_canonical_urls_collapse_law(spark, sf_dir):
    """Every logical page's four messy spellings collapse to ONE
    canonical group of exactly 4 pages / ≥3 distinct raw variants
    (two spellings differ only by the fragment after canonicalization
    of the raw string — still distinct raw URLs)."""
    from linear_quadtree_spark.functions.textexpr import SPARK
    from linear_quadtree_spark.operators.crawl import (
        canonical_urls,
        url_param_variants_expr,
    )
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    u = url_param_variants_expr(SPARK, "doc_id")
    out = canonical_urls(docs.select("doc_id", F.expr(u).alias("url"))).collect()
    assert sum(r.n_pages for r in out) == n
    full = [r for r in out if r.n_pages == 4]
    assert len(full) == n // 4
    assert all(r.n_variants == 4 for r in full)
