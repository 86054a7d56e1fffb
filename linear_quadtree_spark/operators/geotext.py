"""Region-characteristic vocabulary: the purest geospatial × webtext
graft operator — for each raster tile, the terms whose document
frequency INSIDE the tile most exceeds their corpus-wide rate (the
"what is this region about" question a geotagged web corpus answers:
local place names, regional topics, market-specific vocabulary).

Scoring is presence LIFT, the rational form (no logs — IEEE division
and multiplication are exactly rounded, so the ranking is bit-identical
across engines, the tfidf_keywords discipline):

    lift = (tile_df / tile_docs) / (corpus_df / n_docs)
         = (tile_df · n_docs) / (corpus_df · tile_docs)   (as DOUBLE)

Ubiquitous words have lift ≈ 1 everywhere and never rank; a term all
of whose occurrences sit in one tile has lift ≈ n_docs/tile_docs
there. ``min_df`` suppresses hapax noise (a word seen in < min_df
docs corpus-wide cannot be evidence about a region).

Scale shape: ONE corpus-sized shuffle — the distinct (doc, token)
presence aggregate (partial aggregation dedups map-side). The tile
rides into that aggregate as a pure id-derived expression (geotags are
functions of the doc id), so (tile, token) counts come out of the SAME
aggregate, not a second pass; corpus df is a token-level rollup of
that tracked relation; per-tile doc counts are ≤ 4^level rows. Both
small relations broadcast back. The final per-tile top-k is a
row_number window whose rank filter compiles to WindowGroupLimit —
map tasks forward ≤ k rows per tile (CI-asserted), so the window stage
moves O(tiles·k).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from linear_quadtree_spark.cache import track
from linear_quadtree_spark.config import Bounds, DEFAULT_BOUNDS
from linear_quadtree_spark.functions.geocell import geocell_col, geocell_sql_duck
from linear_quadtree_spark.functions.geotag import (
    geotag_x_sql,
    geotag_y_sql,
)
from linear_quadtree_spark.functions.textexpr import DUCK, tokens_expr

__all__ = [
    "tile_terms",
    "tile_terms_sql_duck",
    "host_spread",
    "host_spread_sql_duck",
    "tile_term_drift",
    "tile_term_drift_sql_duck",
]


def tile_terms(
    docs: DataFrame,
    level: int = 2,
    top_k: int = 3,
    min_df: int = 2,
    bounds: Bounds = DEFAULT_BOUNDS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(tile, token, tile_df, tile_docs, corpus_df, lift, rank) — the
    ``top_k`` highest-lift terms per occupied tile, ties → token asc."""
    from linear_quadtree_spark.functions.textexpr import SPARK as _S

    tile = geocell_col(
        geotag_x_sql(id_col), geotag_y_sql(id_col), bounds, level
    ).alias("tile")
    toks = F.expr(tokens_expr(_S, text_col))
    # distinct (tile, doc, token) presence — ONE corpus-sized shuffle;
    # tile is a function of the doc id so the triple dedups to (doc,
    # token) granularity with the tile attached for free
    presence = track(
        docs.select(F.col(id_col), tile, F.explode(toks).alias("token"))
        .groupBy("tile", id_col, "token")
        .agg(F.lit(1).alias("_one"))
        .select("tile", id_col, "token")
    )
    tile_df = track(
        presence.groupBy("tile", "token").agg(F.count(F.lit(1)).alias("tile_df"))
    )
    # a document lives in exactly ONE tile, so distinct (doc, token)
    # pairs partition by tile and corpus df is a rollup of tile_df —
    # tiles×vocab input, far below the doc×token presence relation
    corpus_df = (
        tile_df.groupBy("token")
        .agg(F.sum("tile_df").alias("corpus_df"))
        .filter(F.col("corpus_df") >= min_df)
    )
    tile_docs = docs.select(tile).groupBy("tile").agg(
        F.count(F.lit(1)).alias("tile_docs")
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tile_df.join(F.broadcast(corpus_df), "token")
        .join(F.broadcast(tile_docs), "tile")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "lift",
            (F.col("tile_df").cast("double") * F.col("n_docs").cast("double"))
            / (F.col("corpus_df").cast("double") * F.col("tile_docs").cast("double")),
        )
    )
    w = Window.partitionBy("tile").orderBy(F.col("lift").desc(), F.col("token"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= top_k)
        .select("tile", "token", "tile_df", "tile_docs", "corpus_df", "lift", "rank")
    )


def tile_terms_sql_duck(
    src: str = "documents",
    level: int = 2,
    top_k: int = 3,
    min_df: int = 2,
    bounds: Bounds = DEFAULT_BOUNDS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin — same cell/token/lift expression texts."""
    cell = geocell_sql_duck(geotag_x_sql(id_col), geotag_y_sql(id_col), bounds, level)
    return f"""
WITH t AS (SELECT {id_col}, {cell} AS tile,
                  {tokens_expr(DUCK, text_col)} AS toks FROM {src}),
presence AS (
  SELECT DISTINCT tile, {id_col}, unnest(toks) AS token FROM t),
tdf AS (SELECT tile, token, CAST(COUNT(*) AS BIGINT) AS tile_df
        FROM presence GROUP BY 1, 2),
cdf AS (SELECT token, CAST(SUM(tile_df) AS BIGINT) AS corpus_df
        FROM tdf GROUP BY 1 HAVING SUM(tile_df) >= {min_df}),
tdocs AS (SELECT tile, CAST(COUNT(*) AS BIGINT) AS tile_docs
          FROM t GROUP BY 1),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM {src}),
s AS (
  SELECT tdf.tile, tdf.token, tdf.tile_df, tdocs.tile_docs, cdf.corpus_df,
         (CAST(tdf.tile_df AS DOUBLE) * CAST(n.n_docs AS DOUBLE))
           / (CAST(cdf.corpus_df AS DOUBLE) * CAST(tdocs.tile_docs AS DOUBLE)) AS lift
  FROM tdf JOIN cdf USING (token) JOIN tdocs USING (tile) CROSS JOIN n),
r AS (
  SELECT *, CAST(ROW_NUMBER() OVER (
    PARTITION BY tile ORDER BY lift DESC, token) AS INTEGER) AS rank
  FROM s)
SELECT tile, token, tile_df, tile_docs, corpus_df, lift, rank
FROM r WHERE rank <= {top_k}
"""


# ------------------------------------------------------------- host spread
def host_spread(
    docs: DataFrame,
    level: int = 2,
    bounds: Bounds = DEFAULT_BOUNDS,
    host_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Geographic spread per host — the host-side mirror of the
    tile-side concentration diagnostic: for each publisher, how many
    tiles its pages cover and how concentrated that footprint is
    (``spread_hhi_ppm = 10^6 · Σ_t c_t² div (Σ_t c_t)²``; 10^6 = a
    purely local host, →10^6/n_tiles = evenly global). Separates local
    publishers from global ones when weighting a geo-balanced corpus
    mix (the geographic analog of the language-mixture rebalancer).

    Integer-exact (squares + one integer division), hash-checkable;
    ceiling: per-host docs ≤ ~3·10^6 per tile keeps 10^6·Σc² in int64.
    Plan: one shuffle to (host, tile) counts (map-side combined), one
    host rollup of that relation. Docs touched once.
    Output: (host, n_docs, n_tiles, top_tile_docs, spread_hhi_ppm).
    """
    per_tile = (
        docs.select(
            F.col(host_col).alias("host"),
            geocell_col(
                geotag_x_sql(id_col), geotag_y_sql(id_col), bounds, level
            ).alias("tile"),
        )
        .groupBy("host", "tile")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        per_tile.groupBy("host")
        .agg(
            F.sum("c").alias("n_docs"),
            F.count(F.lit(1)).alias("n_tiles"),
            F.max("c").alias("top_tile_docs"),
            F.sum(F.col("c") * F.col("c")).alias("_ss"),
        )
        .select(
            "host",
            "n_docs",
            "n_tiles",
            "top_tile_docs",
            F.expr("(1000000 * _ss) div (n_docs * n_docs)").alias("spread_hhi_ppm"),
        )
    )


def host_spread_sql_duck(
    src: str = "documents",
    level: int = 2,
    bounds: Bounds = DEFAULT_BOUNDS,
    host_col: str = "source",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin — same cell expression, same integer HHI."""
    cell = geocell_sql_duck(geotag_x_sql(id_col), geotag_y_sql(id_col), bounds, level)
    return f"""
WITH per_tile AS (
  SELECT {host_col} AS host, {cell} AS tile, CAST(COUNT(*) AS BIGINT) AS c
  FROM {src} GROUP BY 1, 2),
agg AS (
  SELECT host, CAST(SUM(c) AS BIGINT) AS n_docs,
         CAST(COUNT(*) AS BIGINT) AS n_tiles,
         CAST(MAX(c) AS BIGINT) AS top_tile_docs,
         CAST(SUM(c * c) AS BIGINT) AS ss
  FROM per_tile GROUP BY 1)
SELECT host, n_docs, n_tiles, top_tile_docs,
       (1000000 * ss) // (n_docs * n_docs) AS spread_hhi_ppm
FROM agg
"""


# ---------------------------------------------------------- term drift
def _drift_chi2_expr() -> str:
    """The one shared double expression: 2x2 chi-square of (term
    presence x epoch) within a tile, from exact integer cells. With
    d = df_a*n_b - df_b*n_a (the cross-product difference; an exact
    int64 cast exactly to double while |d| < 2^53):

        chi2 = N * d^2 / (n_a * n_b * T * (N - T)),
        N = n_a + n_b, T = df_a + df_b.
    """
    return (
        "(CAST(n_a + n_b AS DOUBLE)"
        " * CAST(df_a * n_b - df_b * n_a AS DOUBLE)"
        " * CAST(df_a * n_b - df_b * n_a AS DOUBLE))"
        " / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)"
        " * CAST(df_a + df_b AS DOUBLE)"
        " * CAST(n_a + n_b - df_a - df_b AS DOUBLE))"
    )


_DRIFT_DIR_EXPR = (
    "CASE WHEN df_b * n_a > df_a * n_b THEN 1 "
    "WHEN df_b * n_a < df_a * n_b THEN -1 ELSE 0 END"
)


def tile_term_drift(
    docs: DataFrame,
    level: int = 2,
    top_k: int = 3,
    min_df: int = 4,
    bounds: Bounds = DEFAULT_BOUNDS,
    text_col: str = "text",
    id_col: str = "doc_id",
    epoch_expr: str | None = None,
) -> DataFrame:
    """Per-tile vocabulary drift between two corpus epochs — "what
    changed HERE between snapshot A and snapshot B": for each tile,
    the terms whose document-frequency rate differs most between the
    epochs by the 2x2 chi-square statistic (term presence x epoch,
    within the tile). The geo-temporal monitoring query a recrawled
    web corpus answers: emerging local topics, dying place names,
    regional events entering the vocabulary.

    ``epoch_expr`` is a 0/1 SQL expression labelling each doc's epoch
    (0 = A/old, 1 = B/new) — in production the snapshot/crawl id;
    defaults to ``{id}_col % 2``, the deterministic stand-in the
    synthetic tables support. ``direction`` is +1 when the term's rate
    RISES in epoch B, -1 when it falls, 0 on exact rate ties — decided
    by integer cross-products, never by float rates.

    Exactness: all four 2x2 cells are exact BIGINTs from one presence
    aggregate; chi2 is ONE shared double expression over them (the
    cross-product difference d = df_a*n_b - df_b*n_a stays int64 and
    casts to double exactly while |d| < 2^53 — document-count scales
    far beyond any tile). Ranking ties break on token asc.

    Scale shape (the tile_terms discipline): ONE corpus-sized shuffle —
    the distinct (doc, token) presence aggregate; tile AND epoch ride
    in as pure id-derived expressions, so (tile, token, epoch counts)
    come out of that same aggregate. Per-tile epoch doc counts are
    ≤ 4^level rows and broadcast back. The per-tile top-k is a
    row_number window whose rank filter compiles to WindowGroupLimit.
    Output: (tile, token, df_a, df_b, n_a, n_b, chi2, direction, rank).
    """
    from linear_quadtree_spark.functions.textexpr import SPARK as _S

    ep = epoch_expr or f"{id_col} % 2"
    tile = geocell_col(
        geotag_x_sql(id_col), geotag_y_sql(id_col), bounds, level
    ).alias("tile")
    toks = F.expr(tokens_expr(_S, text_col))
    presence = (
        docs.select(
            F.col(id_col),
            tile,
            F.expr(f"CAST({ep} AS BIGINT)").alias("epoch"),
            F.explode(toks).alias("token"),
        )
        .groupBy("tile", id_col, "epoch", "token")
        .agg(F.lit(1).alias("_one"))
    )
    ab = presence.groupBy("tile", "token").agg(
        F.sum(1 - F.col("epoch")).alias("df_a"),
        F.sum("epoch").alias("df_b"),
    )
    tile_docs = (
        docs.select(tile, F.expr(f"CAST({ep} AS BIGINT)").alias("epoch"))
        .groupBy("tile")
        .agg(
            F.sum(1 - F.col("epoch")).alias("n_a"),
            F.sum("epoch").alias("n_b"),
        )
    )
    scored = (
        ab.join(F.broadcast(tile_docs), "tile")
        .filter(
            (F.col("n_a") > 0)
            & (F.col("n_b") > 0)
            & (F.col("df_a") + F.col("df_b") >= min_df)
            & (F.col("df_a") + F.col("df_b") < F.col("n_a") + F.col("n_b"))
        )
        .withColumn("chi2", F.expr(_drift_chi2_expr()))
        .withColumn("direction", F.expr(_DRIFT_DIR_EXPR).cast("int"))
    )
    w = Window.partitionBy("tile").orderBy(F.col("chi2").desc(), F.col("token"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= top_k)
        .select(
            "tile", "token", "df_a", "df_b", "n_a", "n_b",
            "chi2", "direction", "rank",
        )
    )


def tile_term_drift_sql_duck(
    src: str = "documents",
    level: int = 2,
    top_k: int = 3,
    min_df: int = 4,
    bounds: Bounds = DEFAULT_BOUNDS,
    text_col: str = "text",
    id_col: str = "doc_id",
    epoch_expr: str | None = None,
) -> str:
    """DuckDB twin — same cell/token/epoch expressions, same chi2 and
    direction expressions, same window ranking."""
    ep = epoch_expr or f"{id_col} % 2"
    cell = geocell_sql_duck(geotag_x_sql(id_col), geotag_y_sql(id_col), bounds, level)
    return f"""
WITH t AS (SELECT {id_col}, {cell} AS tile,
                  CAST({ep} AS BIGINT) AS epoch,
                  {tokens_expr(DUCK, text_col)} AS toks FROM {src}),
presence AS (
  SELECT DISTINCT tile, {id_col}, epoch, unnest(toks) AS token FROM t),
ab AS (SELECT tile, token,
              CAST(SUM(1 - epoch) AS BIGINT) AS df_a,
              CAST(SUM(epoch) AS BIGINT) AS df_b
       FROM presence GROUP BY 1, 2),
tdocs AS (SELECT tile,
                 CAST(SUM(1 - epoch) AS BIGINT) AS n_a,
                 CAST(SUM(epoch) AS BIGINT) AS n_b
          FROM t GROUP BY 1),
s AS (
  SELECT ab.tile, ab.token, ab.df_a, ab.df_b, tdocs.n_a, tdocs.n_b,
         {_drift_chi2_expr()} AS chi2,
         CAST({_DRIFT_DIR_EXPR} AS INTEGER) AS direction
  FROM ab JOIN tdocs USING (tile)
  WHERE n_a > 0 AND n_b > 0
    AND df_a + df_b >= {min_df}
    AND df_a + df_b < n_a + n_b),
r AS (
  SELECT *, CAST(ROW_NUMBER() OVER (
    PARTITION BY tile ORDER BY chi2 DESC, token) AS INTEGER) AS rank
  FROM s)
SELECT tile, token, df_a, df_b, n_a, n_b, chi2, direction, rank
FROM r WHERE rank <= {top_k}
"""
