"""Integer range-lookup join: tag each fact row with the attributes of
the (non-overlapping) interval that contains its value — the IP→ASN /
IP→geo enrichment every crawl pipeline runs over its capture logs, and
the generic dimension shape for byte-offset → WARC-segment, timestamp
→ release-window, or id-block → shard lookups.

Spark has no built-in range join; the naive formulations are a
broadcast nested-loop (`f.v BETWEEN r.lo AND r.hi` compiles to
BroadcastNestedLoopJoin — O(facts x ranges) comparisons even when the
dim is broadcast) or an inequality sort-merge that degenerates the same
way. This one is neither, and it never materializes a join operator:

    ranges  --explode--> one copy per 2^bucket_bits bucket it spans
    facts(+null payload) ∪ exploded ranges
      → ONE shuffle on the bucket
      → per-bucket sort by (point, is_fact)
      → last(payload, ignorenulls) running window
      → keep fact rows; null the payload where v > matched range end

Within a bucket, the interval with the greatest start at-or-before v
is the running `last`; because intervals don't overlap, it is the ONLY
candidate, and the `v <= end` post-filter turns gap probes into NULLs.
An interval replicated into a later bucket keeps its true start, which
sorts before every fact in that bucket — exactly the carry-over the
running window needs. This is the asof-join single-exchange shape
(operators/asof.py) generalized from "latest version at-or-before" to
"containing interval", with the bucket standing in for the join key so
the window never collapses to one partition.

Scale shape: the only corpus-sized move is one hash shuffle of
facts ∪ exploded-ranges on the bucket id. Dim replication is
ceil(span / 2^bucket_bits) + 1 copies per interval — with /8 buckets
(bucket_bits=24) a full-IPv4 BGP table (~10^6 intervals, typical span
« 2^24) stays ~1x; one pathological 0.0.0.0/0 interval costs 256
copies, still nothing. Facts are touched exactly once; hot buckets
split under AQE like any other key.

The reference engine has no dimension-lookup layer (its keys ARE the
geometry, lqt.h:29-116); this extends its integer-key discipline to
the enrichment joins a web-corpus pipeline runs around the spatial
core.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["range_lookup", "range_lookup_sql_duck"]


def range_lookup(
    facts: DataFrame,
    ranges: DataFrame,
    value_col: str,
    start_col: str,
    end_col: str,
    payload_cols: list[str],
    bucket_bits: int = 24,
) -> DataFrame:
    """All fact columns + ``matched_start`` (the containing interval's
    start, NULL when the value falls in a gap) + ``payload_cols`` from
    that interval. Intervals are [start, end] BOTH-inclusive integers
    and must not overlap; if they do, the greatest-start containing
    interval wins deterministically. Values and bounds are cast to
    BIGINT; negative values are callers' responsibility (bucket ids
    stay consistent either way via shiftright's sign extension)."""
    for c in (value_col,):
        if c not in facts.columns:
            raise ValueError(f"facts missing column {c!r}")
    for c in (start_col, end_col, *payload_cols):
        if c not in ranges.columns:
            raise ValueError(f"ranges missing column {c!r}")
    clash = (set(payload_cols) | {"matched_start"}) & set(facts.columns)
    if clash:
        raise ValueError(f"fact/payload column clash: {sorted(clash)}")

    b = 2**bucket_bits
    f_side = facts.withColumn("_pt", F.col(value_col).cast("long")).withColumn(
        "_bkt", F.expr(f"shiftright(_pt, {bucket_bits})")
    ).withColumn("_is_fact", F.lit(1))
    r_side = (
        ranges.select(
            F.col(start_col).cast("long").alias("_pt"),
            F.col(start_col).cast("long").alias("matched_start"),
            F.col(end_col).cast("long").alias("_end"),
            *payload_cols,
        )
        .withColumn(
            "_bkt",
            F.explode(
                F.sequence(
                    F.expr(f"shiftright(_pt, {bucket_bits})"),
                    F.expr(f"shiftright(_end, {bucket_bits})"),
                )
            ),
        )
        .withColumn("_is_fact", F.lit(0))
    )
    # replication guard: sequence() itself raises past 10^6 elements, but
    # fail with the actionable message first
    if bucket_bits < 0 or bucket_bits > 62:
        raise ValueError("bucket_bits must be in [0, 62]")

    u = f_side.unionByName(r_side, allowMissingColumns=True)
    w = (
        Window.partitionBy("_bkt")
        .orderBy(F.col("_pt").asc(), F.col("_is_fact").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = ["matched_start", "_end", *payload_cols]
    for c in carried:
        u = u.withColumn(c, F.last(c, ignorenulls=True).over(w))
    out = u.filter(F.col("_is_fact") == 1)
    miss = F.col("_pt") > F.col("_end")
    for c in ["matched_start", *payload_cols]:
        out = out.withColumn(c, F.when(miss, F.lit(None)).otherwise(F.col(c)))
    return out.drop("_pt", "_bkt", "_is_fact", "_end")


def range_lookup_sql_duck(
    facts_cte: str,
    ranges_cte: str,
    value_col: str,
    start_col: str,
    end_col: str,
    payload_cols: list[str],
    fact_cols: list[str],
) -> str:
    """DuckDB twin by DEFINITION — a left inequality join, the plan
    family the Spark side deliberately avoids — so the oracle shares no
    machinery with the implementation (anti-copy by construction)."""
    pay = ", ".join(f"r.{c} AS {c}" for c in payload_cols)
    fc = ", ".join(f"f.{c} AS {c}" for c in fact_cols)
    return f"""
SELECT {fc},
       CAST(r.{start_col} AS BIGINT) AS matched_start, {pay}
FROM {facts_cte} f
LEFT JOIN {ranges_cte} r
  ON CAST(f.{value_col} AS BIGINT) >= CAST(r.{start_col} AS BIGINT)
 AND CAST(f.{value_col} AS BIGINT) <= CAST(r.{end_col} AS BIGINT)
"""
