"""Crawl-frontier politeness scheduling: assign every URL a (wave,
slot) so that no host ever has more than its per-host capacity in
flight — the planning step between "frontier table" and "fetch fleet"
in any web crawler. The reference engine has no scheduling layer; this
applies its deterministic-ordering discipline (ties always broken,
same input → same plan) to crawl operations around the index.

Semantics: within each host, URLs are ranked by (priority DESC, url
ASC — a total order, so reruns and resumed crawls produce the SAME
schedule); rank r (0-based) fetches in wave r div cap, slot r mod cap,
where cap is the host's concurrency budget (robots crawl-delay
converted to slots). A host with cap=1 serializes completely; the
politeness invariant — per (host, wave) group size ≤ cap — is asserted
in tests.

Scale shape: ONE shuffle on host (the window), plus an optional
broadcast of the per-host capacity dimension (hosts ≪ urls; ~10^8
hosts on the full web is still broadcast-able at 16 bytes each, and if
not, the join degrades to a shuffle on the same key the window already
uses). Hot hosts — the crawl frontier's defining skew, 10^7 urls on
one domain — serialize within their partition, which is exactly the
semantics (their schedule IS sequential); other partitions proceed
independently, and nothing is quadratic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["fetch_schedule", "fetch_schedule_sql_duck"]


def fetch_schedule(
    frontier: DataFrame,
    host_slots: DataFrame | None = None,
    host_col: str = "host",
    url_col: str = "url",
    priority_col: str = "priority",
    default_slots: int = 1,
) -> DataFrame:
    """All frontier columns + (cap, wave, slot). ``host_slots`` is an
    optional (host, cap) dimension — broadcast-joined; hosts absent
    from it (or a None dimension) fall back to ``default_slots``."""
    for c in (host_col, url_col, priority_col):
        if c not in frontier.columns:
            raise ValueError(f"frontier missing column {c!r}")
    d = frontier
    if host_slots is not None:
        d = d.join(F.broadcast(host_slots), on=host_col, how="left")
        d = d.withColumn(
            "cap", F.coalesce(F.col("cap"), F.lit(default_slots)).cast("long")
        )
    else:
        d = d.withColumn("cap", F.lit(default_slots).cast("long"))
    w = Window.partitionBy(host_col).orderBy(
        F.col(priority_col).desc(), F.col(url_col).asc()
    )
    return (
        d.withColumn("_r", F.row_number().over(w).cast("long") - F.lit(1))
        .withColumn("wave", F.expr("_r div cap"))
        .withColumn("slot", F.expr("_r % cap"))
        .drop("_r")
    )


def fetch_schedule_sql_duck(
    frontier_cte: str,
    slots_cte: str | None = None,
    host_col: str = "host",
    url_col: str = "url",
    priority_col: str = "priority",
    default_slots: int = 1,
) -> str:
    """DuckDB twin over a CTE exposing (host, url, priority) and an
    optional (host, cap) CTE."""
    if slots_cte is not None:
        src = (
            f"(SELECT f.*, COALESCE(s.cap, {default_slots}) AS cap "
            f"FROM {frontier_cte} f LEFT JOIN {slots_cte} s USING ({host_col}))"
        )
    else:
        src = f"(SELECT *, CAST({default_slots} AS BIGINT) AS cap FROM {frontier_cte})"
    return f"""
SELECT * EXCLUDE (_r),
       CAST((_r - 1) // cap AS BIGINT) AS wave,
       CAST((_r - 1) % cap AS BIGINT) AS slot
FROM (
  SELECT *, row_number() OVER (
      PARTITION BY {host_col}
      ORDER BY {priority_col} DESC, {url_col} ASC) AS _r
  FROM {src})
"""
