"""Crawl-layer operators: distance self-join, CDX latest-capture dedup,
per-site rollup. Semantics checked against brute-force / first-principles
computations on the session fixture; value-hash parity with DuckDB is
covered by the driver oracle (jobs/check_oracles.py)."""

import math

from pyspark.sql import functions as F

from linear_quadtree_spark import DEFAULT_BOUNDS
from linear_quadtree_spark.operators.build import LQTTable
from linear_quadtree_spark.operators.crawl import (
    captures_table,
    domain_stats,
    latest_capture,
)
from linear_quadtree_spark.operators.spatial import distance_join
from linear_quadtree_spark.sources.pages import pages_table
from linear_quadtree_spark.sources.synth import geotagged_docs


def _build(spark, sf_dir):
    pts = geotagged_docs(spark, sf_dir).select("doc_id", "x", "y")
    return LQTTable.build(pts, DEFAULT_BOUNDS, tiebreaker="doc_id", persist=True)


def test_distance_join_matches_bruteforce(spark, sf_dir):
    tbl = _build(spark, sf_dir)
    r = 3.0
    got = sorted(
        (row.id_a, row.id_b)
        for row in distance_join(tbl, r).select("id_a", "id_b").collect()
    )
    pts = geotagged_docs(spark, sf_dir).select("doc_id", "x", "y").collect()
    coords = [(row.doc_id, float(row.x), float(row.y)) for row in pts]
    exp = sorted(
        (min(a, b), max(a, b))
        for i, (a, ax, ay) in enumerate(coords)
        for b, bx, by in coords[i + 1 :]
        if (ax - bx) ** 2 + (ay - by) ** 2 <= r * r
    )
    assert got == exp and len(got) > 0
    tbl.unpersist()


def test_distance_join_pairs_unique_and_exact(spark, sf_dir):
    tbl = _build(spark, sf_dir)
    r = 5.0
    out = distance_join(tbl, r).collect()
    pairs = [(row.id_a, row.id_b) for row in out]
    # forward-half-neighborhood => each pair exactly once, no dedup pass
    assert len(pairs) == len(set(pairs))
    assert all(a < b for a, b in pairs)
    assert all(row.dist2 <= r * r + 1e-12 for row in out)
    assert all(math.sqrt(row.dist2) <= r for row in out)
    tbl.unpersist()


def test_latest_capture_picks_max_ts(spark, sf_dir):
    caps = captures_table(spark, sf_dir)
    out = latest_capture(caps)
    # one row per url
    n_urls = caps.select("url").distinct().count()
    assert out.count() == n_urls
    # per-url max timestamp and capture count agree with a plain aggregate
    agg = caps.groupBy("url").agg(
        F.max("capture_ts").alias("max_ts"), F.count(F.lit(1)).alias("n")
    )
    joined = out.join(agg, "url")
    bad = joined.filter(
        (F.col("capture_ts") != F.col("max_ts")) | (F.col("n_captures") != F.col("n"))
    ).count()
    assert bad == 0
    # payload rides through: latest row keeps its text column
    assert "text" in out.columns


def test_domain_stats_totals(spark, sf_dir):
    pages = pages_table(spark, sf_dir)
    out = domain_stats(pages)
    total_pages = out.agg(F.sum("n_pages")).first()[0]
    assert total_pages == pages.count()
    # site key is exactly the source path segment
    sites = {row.site for row in out.select("site").collect()}
    sources = {
        row.source
        for row in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("source")
        .distinct()
        .collect()
    }
    assert sites == sources


def test_distance_join_boundary_cases(spark):
    """Adversarial shapes: pairs at EXACTLY distance r (closed predicate),
    duplicate points (dist 0), clusters straddling a grid-cell boundary,
    and points on the domain corner — all vs brute force."""
    import itertools

    r = 2.0
    pts = [
        (1, 1000.0, 1000.0),           # domain corner
        (2, 1000.0 + r, 1000.0),       # exactly r from corner -> included
        (3, 1001.0, 1001.0),
        (4, 1001.0, 1001.0),           # exact duplicate of 3 (dist 0)
        (5, 1001.9999, 1000.0),        # just under cell boundary at x=1002
        (6, 1002.0001, 1000.0),        # just over -> adjacent cell, dist ~2e-4
        (7, 1050.0, 1050.0),           # root midline (side relation)
        (8, 1050.0, 1050.0 + r / 2),   # within r of the midline point
        (9, 1099.0, 1099.0),           # far corner, isolated
    ]
    df = spark.createDataFrame(pts, ["doc_id", "x", "y"])
    tbl = LQTTable.build(df, DEFAULT_BOUNDS, tiebreaker="doc_id", persist=True)
    got = sorted(
        (row.id_a, row.id_b)
        for row in distance_join(tbl, r).select("id_a", "id_b").collect()
    )
    # brute force over the float32-rounded coordinates the table stores
    import numpy as np

    stored = [(i, float(np.float32(x)), float(np.float32(y))) for i, x, y in pts]
    exp = sorted(
        (a, b)
        for (a, ax, ay), (b, bx, by) in itertools.combinations(stored, 2)
        if (ax - bx) ** 2 + (ay - by) ** 2 <= r * r
    )
    assert got == exp
    assert (3, 4) in got        # duplicates pair at dist 0
    assert (1, 2) in got        # exact-r pair included (closed)
    assert (5, 6) in got        # cross-cell-boundary pair found
    assert (7, 8) in got        # side-relation (midline) rows participate
    assert not any(9 in p for p in got)
    tbl.unpersist()


def test_surt_key_collapses_url_variants(spark):
    """All four messy spellings of one page (case, www/www2, default
    ports) canonicalize to the identical SURT key, with the
    reversed-host prefix + ')' + case-preserved path."""
    from linear_quadtree_spark.functions.textexpr import SPARK
    from linear_quadtree_spark.operators.crawl import surt_key_expr, surt_keys

    urls = [
        (0, "https://example.org/news/page-7"),
        (1, "HTTP://WWW.EXAMPLE.ORG/news/page-7"),
        (2, "https://example.org:443/news/page-7"),
        (3, "http://www2.Example.Org:80/news/page-7"),
    ]
    df = surt_keys(spark.createDataFrame(urls, ["i", "url"]))
    keys = {r.surt_key for r in df.collect()}
    assert keys == {"org,example)/news/page-7"}
    # non-default port survives; empty path becomes '/'; path case kept
    extra = [
        (0, "https://a.b.example.net:8080/X/Y"),
        (1, "https://example.net"),
    ]
    got = {
        r.i: r.surt_key
        for r in surt_keys(spark.createDataFrame(extra, ["i", "url"])).collect()
    }
    assert got[0] == "net,example,b,a:8080)/X/Y"
    assert got[1] == "net,example)/"


def test_surt_lockstep_with_duckdb(spark):
    """Spark and DuckDB produce identical SURT keys for the registry's
    variant synth over a sampled id/source grid."""
    import duckdb

    from linear_quadtree_spark.functions.textexpr import DUCK, SPARK
    from linear_quadtree_spark.operators.crawl import (
        surt_key_expr,
        url_variants_expr,
    )

    rows = [(i, s) for i in range(40) for s in ("web", "news", "blog")]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    u = url_variants_expr(SPARK, "doc_id", "source")
    got = {
        (r.doc_id, r.source): (r.url, r.surt)
        for r in df.select(
            "doc_id", "source", F.expr(u).alias("url"),
            F.expr(surt_key_expr(SPARK, url_variants_expr(SPARK, "doc_id", "source"))).alias("surt"),
        ).collect()
    }
    con = duckdb.connect()
    du = url_variants_expr(DUCK, "doc_id", "source")
    dsurt = surt_key_expr(DUCK, du)
    vals = ", ".join(f"({i}, '{s}')" for i, s in rows)
    exp = {
        (i, s): (url, surt)
        for i, s, url, surt in con.execute(
            f"SELECT doc_id, source, {du} AS url, {dsurt} AS surt "
            f"FROM (VALUES {vals}) AS t(doc_id, source)"
        ).fetchall()
    }
    assert got == exp


def test_cdx_range_scan_semantics(spark, sf_dir):
    """cdx_range_scan == brute force: keys in [prefix, prefix+1) only,
    latest capture per canonical key wins, n_captures counts the whole
    key group — and the prefix WITHOUT a trailing slash picks up src1
    AND src10..src19 (prefix algebra, not path equality)."""
    from collections import defaultdict

    from linear_quadtree_spark.operators.crawl import (
        cdx_captures,
        cdx_prefix_bounds,
        cdx_range_scan,
        surt_keys,
    )

    prefix = "org,example)/src1"
    caps = cdx_captures(spark, sf_dir)
    rows = surt_keys(caps).collect()
    lo, hi = cdx_prefix_bounds(prefix)
    groups = defaultdict(list)
    for r in rows:
        if lo <= r.surt_key < hi:
            groups[r.surt_key].append(r)
    want = {}
    for k, g in groups.items():
        best = max(g, key=lambda r: (r.capture_ts, r.capture))
        want[k] = (best.doc_id, best.url, best.capture_ts, len(g))
    got = {
        r.surt_key: (r.doc_id, r.url, r.capture_ts, r.n_captures)
        for r in cdx_range_scan(caps, prefix).collect()
    }
    assert got == want and len(got) > 0
    # the range covers more than the slash-terminated path (src10..)
    assert any(k.startswith("org,example)/src10/") for k in got)
    # multi-spelled recrawls really collapsed: some key's group holds
    # >1 distinct raw spellings
    assert any(
        len({r.url for r in g}) > 1 for g in groups.values() if len(g) > 1
    )


def test_cdx_bounds_are_exact_prefix():
    from linear_quadtree_spark.operators.crawl import cdx_prefix_bounds

    lo, hi = cdx_prefix_bounds("org,example)/a")
    assert lo == "org,example)/a" and hi == "org,example)/b"
    # closed-open: the prefix itself is in, the incremented bound is out
    assert lo <= "org,example)/a/x" < hi
    assert not (lo <= "org,example)/b" < hi)


def test_snapshot_diff_statuses_first_principles(spark, sf_dir):
    """Status per url recomputed from the synth mutation rules: %7==3
    gone, %7==5 changed, %11==0 spawns an added url, the rest same —
    plus the invariants: every url appears exactly once, lens are -1
    exactly on the missing side."""
    from linear_quadtree_spark.operators.crawl import (
        _DIFF_CHG_RES,
        _DIFF_GONE_MOD,
        _DIFF_GONE_RES,
        _DIFF_NEW_MOD,
        _DIFF_NEW_OFFSET,
        snapshot_diff,
        snapshot_pair,
    )

    old, new = snapshot_pair(spark, sf_dir)
    rows = snapshot_diff(old, new).collect()
    urls = [r.url for r in rows]
    assert len(urls) == len(set(urls))
    by_url = {r.url: r for r in rows}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    for d in docs:
        url = f"https://example.org/{d.source}/page-{d.doc_id}"
        r = by_url[url]
        if d.doc_id % _DIFF_GONE_MOD == _DIFF_GONE_RES:
            assert r.status == "gone" and r.new_len == -1 and r.old_len >= 0
        elif d.doc_id % _DIFF_GONE_MOD == _DIFF_CHG_RES:
            assert r.status == "changed"
            assert r.new_len == r.old_len + len(" updated")
        else:
            assert r.status == "same" and r.old_len == r.new_len
        if d.doc_id % _DIFF_NEW_MOD == 0:
            added_url = (
                f"https://example.org/{d.source}/page-{d.doc_id + _DIFF_NEW_OFFSET}"
            )
            a = by_url[added_url]
            assert a.status == "added" and a.old_len == -1


def test_snapshot_diff_same_snapshot_is_all_same(spark, sf_dir):
    from linear_quadtree_spark.operators.crawl import snapshot_diff, snapshot_pair

    old, _ = snapshot_pair(spark, sf_dir)
    rows = snapshot_diff(old, old).collect()
    assert rows and all(r.status == "same" for r in rows)
