"""Redirect-chain resolution: map every source URL to the final target
of its 301/302 chain — the canonicalization step a crawl index runs
before dedup (a page reachable through 4 redirect hops is the SAME
page; frontier urls must resolve before scheduling). The redirect map
is a functional graph (≤ 1 outgoing edge per url after dedup), chains
end at urls with no outgoing edge, and misconfigured sites produce
cycles — which must be DETECTED, not looped on.

Algorithm — pointer doubling (the path-halving half of the
connected-components machinery, operators/components.py:49, adapted to
directed functional graphs): each round joins the pointer relation
with itself, composing f^k into f^2k and summing traversed hop counts,
so a chain of length L resolves in ceil(log2 L) rounds — 10-hop spam
chains take 4 rounds, never 10 sequential joins. The driver holds ONE
scalar per round (count of rows that still moved); `localCheckpoint`
truncates lineage per round exactly as components does. Rows still
pointing at a non-terminal url after convergence/cap are ON A CYCLE
(a functional path that never reaches a terminal must revisit): they
get final_url = NULL, hops = NULL, is_cycle = 1 — deterministically,
via one final semi-join flag, not a timeout heuristic.

Scale shape: each round is one equi-join shuffle of the redirect
relation with itself (redirects ≪ pages); round count is logarithmic
in the longest chain, bounded by max_rounds (2^50-length chains don't
exist). The DuckDB oracle is a RECURSIVE single-step walk — a
deliberately different plan family (O(L) steps, arg_max terminal pick)
so agreement checks semantics, not shared code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["resolve_redirects", "resolve_redirects_sql_duck"]


def resolve_redirects(
    edges: DataFrame,
    src_col: str = "src_url",
    dst_col: str = "dst_url",
    max_rounds: int = 50,
    max_chain: int | None = None,
) -> DataFrame:
    """(src_col, final_url, hops, is_cycle) for every url with an
    outgoing redirect. Duplicate outgoing edges collapse to min(dst)
    for determinism before resolution.

    Cycle members are detected by the path-length argument — an acyclic
    functional walk visits distinct sources, so accumulated hops above
    the source count proves a revisit. Such rows FREEZE (ptr → NULL)
    the round the bound trips, so the loop terminates in
    O(log min(bound, longest_chain)) rounds instead of spinning on the
    cycle until max_rounds; pass ``max_chain`` (e.g. a crawler's
    redirect-follow limit, typically ≤ 20) to tighten the bound below
    the source count and save the extra doubling rounds."""
    f = (
        edges.groupBy(F.col(src_col).alias("src"))
        .agg(F.min(dst_col).alias("ptr"))
        .withColumn("hops", F.lit(1).cast("long"))
        .localCheckpoint()
    )
    bound = max_chain if max_chain is not None else f.count()
    for _ in range(max_rounds):
        b = f.select(
            F.col("src").alias("b_src"),
            F.col("ptr").alias("b_ptr"),
            F.col("hops").alias("b_hops"),
        )
        j = f.join(b, f["ptr"] == b["b_src"], "left")
        new_hops = F.col("hops") + F.coalesce("b_hops", F.lit(0))
        cyc_now = F.col("b_ptr").isNotNull() & (new_hops > F.lit(bound))
        nf = j.select(
            "src",
            F.when(cyc_now, F.lit(None))
            .otherwise(F.coalesce("b_ptr", "ptr"))
            .alias("ptr"),
            new_hops.alias("hops"),
            (F.col("b_ptr").isNotNull() & ~cyc_now).alias("_moved"),
        ).localCheckpoint()
        moved = nf.filter("_moved").count()
        f = nf.drop("_moved")
        if moved == 0:
            break
    # cycle flag: frozen pointer, or (if max_rounds exhausted first) a
    # pointer that still has an outgoing edge.
    srcs = f.select(F.col("src").alias("t_src")).distinct()
    out = f.join(srcs, f["ptr"] == srcs["t_src"], "left")
    cyc = F.col("ptr").isNull() | F.col("t_src").isNotNull()
    return out.select(
        F.col("src").alias(src_col),
        F.when(cyc, F.lit(None)).otherwise(F.col("ptr")).alias("final_url"),
        F.when(cyc, F.lit(None)).otherwise(F.col("hops")).alias("hops"),
        cyc.cast("int").alias("is_cycle"),
    )


def resolve_redirects_sql_duck(
    edges_cte: str,
    src_col: str = "src_url",
    dst_col: str = "dst_url",
    max_steps: int = 64,
) -> str:
    """DuckDB twin by single-step RECURSIVE walk (independent plan
    family). `max_steps` bounds the walk: chains longer than it would
    misreport as cycles — it is an oracle-fixture bound, not an engine
    limit (the Spark side resolves 2^max_rounds hops)."""
    return f"""rdedges AS (
  SELECT {src_col} AS src, MIN({dst_col}) AS dst FROM {edges_cte} GROUP BY 1),
rdwalk(src, ptr, steps) AS (
  SELECT src, dst, CAST(1 AS BIGINT) FROM rdedges
  UNION ALL
  SELECT w.src, e.dst, w.steps + 1
  FROM rdwalk w JOIN rdedges e ON w.ptr = e.src
  WHERE w.steps <= {max_steps}),
rdfin AS (
  SELECT src, arg_max(ptr, steps) AS ptr, MAX(steps) AS steps
  FROM rdwalk GROUP BY 1)
SELECT f.src AS {src_col},
       CASE WHEN r.src IS NOT NULL THEN NULL ELSE f.ptr END AS final_url,
       CASE WHEN r.src IS NOT NULL THEN NULL ELSE f.steps END AS hops,
       CAST(r.src IS NOT NULL AS INTEGER) AS is_cycle
FROM rdfin f LEFT JOIN rdedges r ON f.ptr = r.src"""
