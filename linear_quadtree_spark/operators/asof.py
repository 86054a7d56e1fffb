"""As-of (temporal) join: match each probe row to the latest version
row at-or-before its timestamp, per key — the CDX-replay lookup ("what
did this url serve at time T") and the standard point-in-time join of
any event/feature pipeline. Spark has no built-in as-of join; the
naive formulations are an inequality join (quadratic per key) or a
per-key collect. This one is neither.

Scale shape — the UNION + WINDOW as-of:

    probes(+null payload)  ∪  versions(payload)
      → ONE shuffle on the key
      → per-key sort by (ts, is_probe)
      → last(payload, ignorenulls) over rows UNBOUNDED..CURRENT
      → keep probe rows

A single exchange for any probe:version ratio; no join operator at
all, so there is nothing to explode quadratically on version-heavy
keys — each row is touched once by the running window. Hot keys
serialize within their partition (the sort order is the semantics);
at 10^12 rows the key is a full url, whose hash partitioning is
near-uniform, and AQE absorbs residual skew.

The reference has no temporal layer (SURVEY §2.9); this exists for
the north rule's multi-capture crawl index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "asof_join_sql_duck"]


def asof_join(
    probes: DataFrame,
    versions: DataFrame,
    key_cols: list[str],
    probe_ts_col: str,
    version_ts_col: str,
    payload_cols: list[str],
    version_tiebreak: str | None = None,
    tolerance_s: int | None = None,
) -> DataFrame:
    """All probe columns + `matched_ts` (the matched version's
    timestamp) + `payload_cols` from that version; all matched fields
    NULL when no version exists at-or-before the probe (or outside
    `tolerance_s`). Equal timestamps match inclusively (version wins
    over probe at the same instant). If one key can carry several
    versions with the SAME timestamp, pass `version_tiebreak` — the
    greatest tiebreak value wins — to keep the result deterministic."""
    for c in (probe_ts_col, *key_cols):
        if c not in probes.columns:
            raise ValueError(f"probes missing column {c!r}")
    ver_cols = [version_ts_col, *key_cols, *payload_cols]
    for c in ver_cols + ([version_tiebreak] if version_tiebreak else []):
        if c not in versions.columns:
            raise ValueError(f"versions missing column {c!r}")
    clash = (set(payload_cols) | {"matched_ts"}) & set(probes.columns)
    if clash:
        raise ValueError(f"probe/payload column clash: {sorted(clash)}")

    l = probes.withColumn("_ts", F.col(probe_ts_col).cast("long")).withColumn(
        "_is_probe", F.lit(1)
    )
    r = versions.select(
        *key_cols,
        F.col(version_ts_col).cast("long").alias("_ts"),
        F.col(version_ts_col).cast("long").alias("matched_ts"),
        *payload_cols,
    ).withColumn("_is_probe", F.lit(0))
    tb = [F.col(version_tiebreak).asc_nulls_first()] if version_tiebreak else []
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col("_ts").asc(), F.col("_is_probe").asc(), *tb)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = ["matched_ts", *payload_cols]
    for c in carried:
        u = u.withColumn(c, F.last(c, ignorenulls=True).over(w))
    out = u.filter(F.col("_is_probe") == 1).drop("_is_probe", "_ts")
    if tolerance_s is not None:
        stale = (
            F.col(probe_ts_col).cast("long") - F.col("matched_ts")
            > F.lit(tolerance_s)
        )
        for c in payload_cols:
            out = out.withColumn(c, F.when(stale, F.lit(None)).otherwise(F.col(c)))
        out = out.withColumn(
            "matched_ts", F.when(stale, F.lit(None)).otherwise(F.col("matched_ts"))
        )
    return out


def asof_join_sql_duck(
    probes_cte: str,
    versions_cte: str,
    key_cols: list[str],
    probe_ts_col: str,
    version_ts_col: str,
    payload_cols: list[str],
    probe_cols: list[str],
    tolerance_s: int | None = None,
) -> str:
    """DuckDB twin by the DEFINITION — inequality LEFT JOIN + window
    argmax per probe (a different plan family than the Spark union
    window). `probe_cols` are carried through; probes must be unique on
    (key_cols, probe_ts_col, probe_cols)."""
    keys = " AND ".join(f"v.{k} = p.{k}" for k in key_cols)
    tol = (
        f" AND p.{probe_ts_col} - v.{version_ts_col} <= {tolerance_s}"
        if tolerance_s is not None
        else ""
    )
    pcols = ", ".join(f"p.{c}" for c in [*key_cols, *probe_cols])
    vcols = ", ".join(f"v.{c}" for c in payload_cols)
    part = ", ".join(f"p.{c}" for c in [*key_cols, probe_ts_col, *probe_cols])
    return f"""
j AS (
  SELECT {pcols}, p.{probe_ts_col},
         v.{version_ts_col} AS matched_ts, {vcols},
         ROW_NUMBER() OVER (
           PARTITION BY {part}
           ORDER BY v.{version_ts_col} DESC NULLS LAST) AS _rn
  FROM {probes_cte} p
  LEFT JOIN {versions_cte} v
    ON {keys} AND v.{version_ts_col} <= p.{probe_ts_col}{tol})
SELECT * EXCLUDE (_rn) FROM j WHERE _rn = 1"""
