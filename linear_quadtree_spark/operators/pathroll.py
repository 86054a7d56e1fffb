"""URL path-hierarchy rollup: page counts (and any associative
aggregate) at EVERY path-prefix depth in one pass — the site-structure
pyramid behind crawl dashboards ("how many pages under /docs/, under
/docs/api/, …"), sitemap generation, and per-section recrawl budgets.
The exact URL analog of the tile pyramid (operators/spatial.py:
tile_pyramid): a parent prefix is exactly the union of its children,
so every depth aggregates the SAME exploded relation — no per-depth
scans, no self-joins.

Plan: one map-side projection splits the url path and emits its
prefixes via `transform(sequence(1, depth))` + explode (a url of depth
d costs d rows, bounded by ``max_depth``), then ONE hash aggregate on
(host, prefix) with map-side combine. Output is bounded by the number
of distinct prefixes — the site's directory tree, not its page count.
Skew = one giant site section; associative counts absorb it map-side,
exactly like domain_stats.

Cross-engine: splitting, slicing, joining are identical in both
engines through the Eng seam (`split_re` / array slice semantics
checked in tests); counts are integers. The DuckDB twin renders the
same expression text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linear_quadtree_spark.functions.textexpr import DUCK, SPARK, Eng

__all__ = ["path_rollup", "path_rollup_sql_duck"]


def _prefixes_expr(e: Eng, url: str, max_depth: int) -> str:
    """ARRAY<STRING> of path prefixes of the url, depth 1..max_depth:
    'https://h/a/b/c' -> ['/a', '/a/b', '/a/b/c']. The scheme+host part
    is stripped (hosts group separately); urls with no path yield
    ['/']."""
    # path = everything from the first '/' after the scheme's '//'
    path = f"regexp_replace({url}, '^[a-z]+://[^/]*', '')" if e.name == "spark" else \
        f"regexp_replace({url}, '^[a-z]+://[^/]*', '')"
    segs = e.filt(e.split_re(f"coalesce(nullif({path}, ''), '/')", "/"), "s", "s <> ''")
    n = f"least({e.size(segs)}, {max_depth})"
    # depth-k prefix = '/' || join of the first k segments
    if e.name == "spark":
        joinfn = lambda arr: f"concat('/', array_join({arr}, '/'))"  # noqa: E731
        slicefn = lambda arr, k: f"slice({arr}, 1, {k})"  # noqa: E731
    else:
        joinfn = lambda arr: f"'/' || array_to_string({arr}, '/')"  # noqa: E731
        slicefn = lambda arr, k: f"{arr}[1:{k}]"  # noqa: E731
    pref = e.transform(
        f"CASE WHEN {n} < 1 THEN {('array(0)' if e.name == 'spark' else '[0]')} "
        f"ELSE {e.seq('1', n)} END",
        "k",
        f"CASE WHEN k = 0 THEN '/' ELSE {joinfn(slicefn(segs, 'CAST(k AS INT)'))} END",
    )
    return pref


def path_rollup(
    pages: DataFrame,
    url_col: str = "url",
    host_col: str | None = None,
    max_depth: int = 8,
) -> DataFrame:
    """(host?, prefix, depth, n_pages) — one row per occupied path
    prefix up to ``max_depth`` segments."""
    pref = _prefixes_expr(SPARK, url_col, max_depth)
    keys = ([host_col] if host_col else []) + ["prefix"]
    ex = pages.select(
        *([host_col] if host_col else []),
        F.explode(F.expr(pref)).alias("prefix"),
    )
    return (
        ex.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_pages"))
        .withColumn(
            "depth",
            F.when(F.col("prefix") == "/", F.lit(0)).otherwise(
                F.length(F.col("prefix"))
                - F.length(F.regexp_replace("prefix", "/", ""))
            ).cast("int"),
        )
        .select(*keys, "depth", "n_pages")
    )


def path_rollup_sql_duck(
    src: str,
    url_col: str = "url",
    host_col: str | None = None,
    max_depth: int = 8,
) -> str:
    pref = _prefixes_expr(DUCK, url_col, max_depth)
    h = f"{host_col}, " if host_col else ""
    hsel = f"{host_col}, " if host_col else ""
    return f"""
SELECT {hsel}prefix,
       CAST(CASE WHEN prefix = '/' THEN 0
            ELSE LENGTH(prefix) - LENGTH(REPLACE(prefix, '/', '')) END
            AS INTEGER) AS depth,
       COUNT(*) AS n_pages
FROM (SELECT {h}unnest({pref}) AS prefix FROM {src})
GROUP BY ALL
"""
