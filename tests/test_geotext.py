"""tile_terms (region-characteristic vocabulary): engineered-corpus
fixture with a tile-exclusive term, a Python brute-force lift oracle
on the real corpus, hapax suppression, and the plan shape."""

import collections

from pyspark.sql import functions as F

from linear_quadtree_spark.cache import release_caches
from linear_quadtree_spark.functions.geocell import geocell_col
from linear_quadtree_spark.functions.geotag import geotag_x_sql, geotag_y_sql
from linear_quadtree_spark.operators.geotext import tile_terms


def _tiles_for_ids(spark, ids, level):
    cell = geocell_col(geotag_x_sql("id"), geotag_y_sql("id"), level=level)
    rows = (
        spark.createDataFrame([(i,) for i in ids], "id: long")
        .select("id", cell.alias("tile"))
        .collect()
    )
    return {r.id: r.tile for r in rows}


def test_tile_exclusive_term_ranks_first(spark):
    level = 2
    ids = list(range(40))
    tile_of = _tiles_for_ids(spark, ids, level)
    by_tile = collections.defaultdict(list)
    for i in ids:
        by_tile[tile_of[i]].append(i)
    # pick the largest tile; give all its docs the marker term
    marked_tile, marked_ids = max(by_tile.items(), key=lambda kv: len(kv[1]))
    assert len(marked_ids) >= 2
    rows = []
    for i in ids:
        text = "the quick fox"
        if i in set(marked_ids):
            text += " zebra"
        if i == ids[0]:
            text += " unicorn"  # hapax: must be suppressed by min_df=2
        rows.append((i, text))
    docs = spark.createDataFrame(rows, "doc_id: long, text: string")
    got = tile_terms(docs, level=level, top_k=2, min_df=2).collect()
    release_caches()
    by_tile_rank1 = {r.tile: r for r in got if r.rank == 1}
    r1 = by_tile_rank1[marked_tile]
    # the exclusive term wins its tile with lift = N / tile_docs
    assert r1.token == "zebra"
    assert r1.tile_df == r1.corpus_df == len(marked_ids)
    assert r1.lift == (len(ids) * 1.0) / len(marked_ids) * (
        len(marked_ids) / len(marked_ids)
    )
    # ubiquitous terms have lift exactly 1.0 everywhere
    for r in got:
        if r.token in ("the", "quick", "fox"):
            assert r.lift == 1.0
        assert r.token != "unicorn"  # hapax suppressed


def test_bruteforce_lift_oracle(spark, sf_dir):
    level, top_k, min_df = 2, 3, 2
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    raw = docs.select("doc_id", "text").collect()
    tile_of = _tiles_for_ids(spark, [r.doc_id for r in raw], level)
    presence = set()
    for r in raw:
        toks = set((r.text or "").lower().split())
        toks.discard("")
        for t in toks:
            presence.add((tile_of[r.doc_id], r.doc_id, t))
    tile_df = collections.Counter((tl, tk) for tl, _, tk in presence)
    corpus_df = collections.Counter()
    for (tl, tk), n in tile_df.items():
        corpus_df[tk] += n
    tile_docs = collections.Counter(tile_of.values())
    n_docs = len(raw)
    exp = {}
    for tl in tile_docs:
        cands = [
            (
                (tile_df[(tl, tk)] * float(n_docs))
                / (corpus_df[tk] * float(tile_docs[tl])),
                tk,
            )
            for (t2, tk) in {(a, c) for a, _, c in presence if a == tl}
            if corpus_df[tk] >= min_df
        ]
        cands.sort(key=lambda x: (-x[0], x[1]))
        exp[tl] = [(tk, lift) for lift, tk in cands[:top_k]]
    got = collections.defaultdict(list)
    for r in sorted(
        tile_terms(docs, level=level, top_k=top_k, min_df=min_df).collect(),
        key=lambda r: (r.tile, r.rank),
    ):
        got[r.tile].append((r.token, r.lift))
    release_caches()
    assert dict(got) == exp


def test_plan_shape(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = tile_terms(docs, level=2)
    out.count()
    plan = out._jdf.queryExecution().executedPlan().toString()
    release_caches()
    assert "WindowGroupLimit" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # vocab and tile-size relations ride broadcasts, never reshuffle
    # the tile_df relation onto them
    assert plan.count("BroadcastHashJoin") >= 2


# --------------------------------------------------------------- host spread
def test_host_spread_bruteforce(spark, sf_dir):
    import collections

    from linear_quadtree_spark.functions.geotag import geotag_x_sql, geotag_y_sql
    from linear_quadtree_spark.operators.geotext import host_spread

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = (
        docs.select(
            "source",
            geocell_col(geotag_x_sql("doc_id"), geotag_y_sql("doc_id"), level=2)
            .alias("t"),
        )
        .collect()
    )
    cnt = collections.Counter((r.source, r.t) for r in rows)
    per_host = collections.defaultdict(list)
    for (h, _), c in cnt.items():
        per_host[h].append(c)
    exp = {
        h: (sum(cs), len(cs), max(cs), 10**6 * sum(c * c for c in cs) // sum(cs) ** 2)
        for h, cs in per_host.items()
    }
    got = {
        r.host: (r.n_docs, r.n_tiles, r.top_tile_docs, r.spread_hhi_ppm)
        for r in host_spread(docs, level=2).collect()
    }
    assert got == exp and len(got) > 3


def test_host_spread_local_vs_global(spark):
    """A host whose docs all land in one tile pins at 10^6; a host
    spread evenly over k tiles scores floor(10^6/k)."""
    import collections

    from pyspark.sql import functions as F

    from linear_quadtree_spark.functions.geotag import geotag_x_sql, geotag_y_sql
    from linear_quadtree_spark.operators.geotext import host_spread

    cand = (
        spark.range(3000)
        .select(
            F.col("id"),
            geocell_col(geotag_x_sql("id"), geotag_y_sql("id"), level=2).alias("t"),
        )
        .collect()
    )
    by_tile = collections.defaultdict(list)
    for r in cand:
        by_tile[r.t].append(r.id)
    tiles = sorted(by_tile, key=lambda t: -len(by_tile[t]))
    local_ids = by_tile[tiles[0]][:4]            # 4 docs, one tile
    global_ids = [by_tile[t][-1] for t in tiles[1:5]]  # 4 docs, 4 tiles
    rows = [(i, "local.example", "x") for i in local_ids] + [
        (i, "global.example", "x") for i in global_ids
    ]
    docs = spark.createDataFrame(rows, "doc_id: long, source: string, text: string")
    got = {r.host: r for r in host_spread(docs, level=2).collect()}
    assert got["local.example"].spread_hhi_ppm == 10**6
    assert got["local.example"].n_tiles == 1
    assert got["global.example"].spread_hhi_ppm == 10**6 // 4
    assert got["global.example"].n_tiles == 4


# ------------------------------------------------------------- term drift
def test_drift_epoch_exclusive_term_ranks_first(spark):
    """A term all of whose tile occurrences sit in epoch B ranks first
    with direction +1; a term present in EVERY doc is excluded (its
    2x2 table degenerates); direction is decided by integer
    cross-products."""
    from linear_quadtree_spark.operators.geotext import tile_term_drift

    level = 2
    ids = list(range(80))
    tile_of = _tiles_for_ids(spark, ids, level)
    by_tile = collections.defaultdict(list)
    for i in ids:
        by_tile[tile_of[i]].append(i)
    # need a tile holding both parities, several of each
    marked_tile, marked_ids = max(
        by_tile.items(),
        key=lambda kv: min(
            sum(1 for i in kv[1] if i % 2 == 0),
            sum(1 for i in kv[1] if i % 2 == 1),
        ),
    )
    rows = []
    for i in ids:
        text = "the quick fox"          # ubiquitous: T == N, excluded
        if i in set(marked_ids) and i % 2 == 1:
            text += " zebra"            # epoch-B exclusive in the tile
        rows.append((i, text))
    docs = spark.createDataFrame(rows, "doc_id: long, text: string")
    got = [
        r
        for r in tile_term_drift(docs, level=level, top_k=2, min_df=2).collect()
        if r.tile == marked_tile
    ]
    assert got, "marked tile must emit a drift row"
    r1 = next(r for r in got if r.rank == 1)
    assert r1.token == "zebra"
    assert r1.df_a == 0 and r1.df_b == sum(1 for i in marked_ids if i % 2 == 1)
    assert r1.direction == 1
    assert all(r.token != "the" for r in got)


def test_drift_bruteforce_chi2_oracle(spark, sf_dir):
    """Full Python recomputation of the per-tile 2x2 chi-square ranking
    on the real corpus."""
    from linear_quadtree_spark.operators.geotext import tile_term_drift

    level, top_k, min_df = 2, 3, 4
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    raw = docs.select("doc_id", "text").collect()
    tile_of = _tiles_for_ids(spark, [r.doc_id for r in raw], level)
    ab = collections.Counter()      # (tile, token, epoch) -> df
    nd = collections.Counter()      # (tile, epoch) -> docs
    for r in raw:
        ep = r.doc_id % 2
        nd[(tile_of[r.doc_id], ep)] += 1
        toks = set((r.text or "").lower().split())
        toks.discard("")
        for t in toks:
            ab[(tile_of[r.doc_id], t, ep)] += 1
    exp = {}
    tiles = {tl for tl, _ in nd}
    for tl in tiles:
        na, nb = nd[(tl, 0)], nd[(tl, 1)]
        if na == 0 or nb == 0:
            continue
        cands = []
        toks = {tk for (t2, tk, _) in ab if t2 == tl}
        for tk in toks:
            a, b = ab[(tl, tk, 0)], ab[(tl, tk, 1)]
            t_all = a + b
            if t_all < min_df or t_all >= na + nb:
                continue
            d = a * nb - b * na
            chi2 = (
                float(na + nb) * float(d) * float(d)
                / (float(na) * float(nb) * float(t_all) * float(na + nb - t_all))
            )
            direction = 1 if b * na > a * nb else (-1 if b * na < a * nb else 0)
            cands.append((-chi2, tk, a, b, direction))
        cands.sort()
        exp[tl] = [
            (tk, a, b, dr, -negchi)
            for negchi, tk, a, b, dr in cands[:top_k]
        ]
    got = collections.defaultdict(list)
    for r in sorted(
        tile_term_drift(docs, level=level, top_k=top_k, min_df=min_df).collect(),
        key=lambda r: (r.tile, r.rank),
    ):
        got[r.tile].append((r.token, r.df_a, r.df_b, r.direction, r.chi2))
    assert dict(got) == {k: v for k, v in exp.items() if v}
    assert sum(len(v) for v in got.values()) > 5


def test_drift_plan_shape(spark, sf_dir):
    """One presence shuffle, tile-epoch doc counts broadcast back, the
    rank filter compiles to WindowGroupLimit, no Python eval."""
    from linear_quadtree_spark.operators.geotext import tile_term_drift

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = tile_term_drift(docs, level=2)
    out.count()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan
