"""Host-graph PageRank: ground-truth recurrence, lockstep, properties.

The operator's contract is the *integer* recurrence documented in
operators/graph.py — so the ground truth here is an independent pure-
Python implementation of that recurrence over the collected edge list,
not a float PageRank with a tolerance.
"""

import duckdb
import pytest

from linear_quadtree_spark.operators.graph import (
    PR_D_DEN,
    PR_D_NUM,
    PR_SCALE,
    host_link_edges,
    host_pagerank_sql_duck,
    pagerank,
)


def _pagerank_py(edges, iters=3, scale=PR_SCALE, d_num=PR_D_NUM, d_den=PR_D_DEN):
    """Reference integer recurrence over a [(src, dst)] list."""
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    rank = {v: scale // n for v in nodes}
    base = ((scale * (d_den - d_num)) // d_den) // n
    for _ in range(iters):
        inflow = {v: 0 for v in nodes}
        for s, d in edges:
            inflow[d] += rank[s] // deg[s]
        rank = {v: base + (d_num * inflow[v]) // d_den for v in nodes}
    return rank


def test_pagerank_matches_python_ground_truth(spark):
    edges = [
        ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
        ("d", "c"), ("d", "a"), ("e", "c"),  # e dangling-in, c the hub
    ]
    df = spark.createDataFrame(edges, "src: string, dst: string")
    got = {r.host: r.rank_fp for r in pagerank(df).collect()}
    want = _pagerank_py(edges)
    assert got == want
    # the hub outranks everything; base-only nodes sit at the floor
    assert got["c"] == max(got.values())
    n = len(want)
    base = ((PR_SCALE * (PR_D_DEN - PR_D_NUM)) // PR_D_DEN) // n
    assert got["e"] == base  # no in-links → teleport mass only


def test_pagerank_dangling_node_keeps_row(spark):
    """A node that only RECEIVES links must still appear (nodes come
    from the union of both edge endpoints) and a node with no in-links
    still gets the teleport base."""
    df = spark.createDataFrame([("a", "b")], "src: string, dst: string")
    got = {r.host: r.rank_fp for r in pagerank(df, iters=1).collect()}
    assert set(got) == {"a", "b"}
    base = ((PR_SCALE * (PR_D_DEN - PR_D_NUM)) // PR_D_DEN) // 2
    assert got["a"] == base
    assert got["b"] == base + (PR_D_NUM * (PR_SCALE // 2)) // PR_D_DEN


def test_pagerank_mass_bounded(spark, sf_dir):
    """Total fixed-point mass never exceeds scale (dangling mass only
    ever drops) — the int64-safety invariant the docstring claims."""
    edges = host_link_edges(spark, sf_dir)
    total = sum(r.rank_fp for r in pagerank(edges).collect())
    assert 0 < total <= PR_SCALE


def test_host_link_edges_skewed_and_deterministic(spark, sf_dir):
    e1 = sorted((r.src, r.dst) for r in host_link_edges(spark, sf_dir).collect())
    e2 = sorted((r.src, r.dst) for r in host_link_edges(spark, sf_dir).collect())
    assert e1 == e2
    indeg = {}
    for _, d in e1:
        indeg[d] = indeg.get(d, 0) + 1
    hosts = {s for s, _ in e1} | {d for _, d in e1}
    # quadratic map → some host indices are unreachable (no in-links at
    # all) and hubs collect distinctly more in-neighbours than leaves
    assert len(indeg) < len(hosts)
    assert 2 * max(indeg.values()) >= 3 * min(indeg.values())


def test_host_pagerank_engine_lockstep(spark, sf_dir):
    got = sorted(
        (r.host, r.rank_fp)
        for r in pagerank(host_link_edges(spark, sf_dir)).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = sorted(map(tuple, con.execute(host_pagerank_sql_duck()).fetchall()))
    assert got == want


def test_anchor_terms_first_principles(spark, sf_dir):
    """Recompute the per-host anchor-term top-k from the collected link
    relation with a plain Python counter — same counts, same (cnt desc,
    token asc) tie rule."""
    from collections import Counter

    from linear_quadtree_spark.operators.graph import (
        anchor_terms,
        host_link_anchors,
    )

    anchors = host_link_anchors(spark, sf_dir)
    rows = anchors.collect()
    counts = {}
    for r in rows:
        for tok in r.anchor.split():
            counts.setdefault(r.dst, Counter())[tok] += 1
    want = []
    for dst, c in counts.items():
        top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        want += [(dst, t, n, i + 1) for i, (t, n) in enumerate(top)]
    got = sorted(tuple(r) for r in anchor_terms(anchors).collect())
    assert got == sorted(want)
    # anchors carry at most n_tokens tokens each
    assert all(len(r.anchor.split()) <= 4 for r in rows)


def test_anchor_terms_engine_lockstep(spark, sf_dir):
    import duckdb as _dd

    from linear_quadtree_spark.operators.graph import (
        anchor_terms,
        anchor_terms_sql_duck,
        host_link_anchors,
    )

    got = sorted(
        tuple(r) for r in anchor_terms(host_link_anchors(spark, sf_dir)).collect()
    )
    con = _dd.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = sorted(map(tuple, con.execute(anchor_terms_sql_duck()).fetchall()))
    assert got == want


def test_tile_rank_composition(spark, sf_dir):
    """PageRank over the od_flows edge graph: total mass bounded by
    scale, every occupied flow node ranked, hubs (high in-degree tiles)
    outrank leaves."""
    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F

    from linear_quadtree_spark.cache import release_caches
    from linear_quadtree_spark.operators.trajectory import od_flows

    out = entrymod.queries()["tile_rank"](spark, sf_dir)
    rows = out.collect()
    release_caches()
    assert sum(r.rank_fp for r in rows) <= 10**12
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    flows = od_flows(ev, zoom=4)
    nodes = (
        flows.select(F.col("tile_from").alias("t"))
        .union(flows.select(F.col("tile_to").alias("t")))
        .distinct()
        .count()
    )
    release_caches()
    assert len(rows) == nodes
    # a rank above the teleport floor requires inflow
    floor = (10**12 * 15 // 100) // nodes
    assert any(r.rank_fp > floor for r in rows)


def _hits_py(edges, iters=3, scale=10**12):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    hub = {n: scale for n in nodes}
    auth = {n: 0 for n in nodes}
    for _ in range(iters):
        auth = {n: 0 for n in nodes}
        for u, v in edges:
            auth[v] += hub[u]
        qa = max(1, max(auth.values()) // scale)
        auth = {n: a // qa for n, a in auth.items()}
        hub = {n: 0 for n in nodes}
        for u, v in edges:
            hub[u] += auth[v]
        qh = max(1, max(hub.values()) // scale)
        hub = {n: h // qh for n, h in hub.items()}
    return {n: (hub[n], auth[n]) for n in nodes}


def test_hits_matches_python_ground_truth(spark):
    from linear_quadtree_spark.cache import release_caches
    from linear_quadtree_spark.operators.graph import hits_scores

    edges = [
        ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
        ("d", "c"), ("d", "a"), ("e", "c"),
    ]
    df = spark.createDataFrame(edges, "src: string, dst: string")
    got = {r.host: (r.hub_fp, r.auth_fp) for r in hits_scores(df).collect()}
    release_caches()
    assert got == _hits_py(edges)
    # c receives from everyone -> top authority; d links both strong
    # authorities -> top hub
    assert got["c"][1] == max(v[1] for v in got.values())
    assert got["d"][0] == max(v[0] for v in got.values())


def test_host_hits_engine_lockstep(spark, sf_dir):
    import duckdb

    from linear_quadtree_spark.cache import release_caches

    from linear_quadtree_spark.operators.graph import (
        hits_scores,
        host_hits_sql_duck,
        host_link_edges,
    )

    got = sorted(
        tuple(r) for r in hits_scores(host_link_edges(spark, sf_dir)).collect()
    )
    release_caches()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    exp = sorted(tuple(r) for r in con.execute(host_hits_sql_duck()).fetchall())
    assert got == exp and len(got) > 5


def test_hits_zero_iters_is_initial_state(spark):
    import duckdb

    from linear_quadtree_spark.cache import release_caches
    from linear_quadtree_spark.operators.graph import (
        PR_SCALE,
        hits_scores,
        host_hits_sql_duck,
    )

    df = spark.createDataFrame([("a", "b")], "src: string, dst: string")
    got = {r.host: (r.hub_fp, r.auth_fp) for r in hits_scores(df, iters=0).collect()}
    release_caches()
    assert got == {"a": (PR_SCALE, PR_SCALE), "b": (PR_SCALE, PR_SCALE)}
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    rows = con.execute(host_hits_sql_duck(iters=0)).fetchall()
    assert all(h == PR_SCALE and a == PR_SCALE for _, h, a in rows)
