"""Crawl-maintenance operators over the Common-Crawl-style page table —
the index-side operations every web corpus needs before any spatial or
training-data processing: capture dedup (CDX "latest per url") and
per-site rollups.

The reference engine has no web layer (it is a pure spatial kernel,
lqt.h:1-30); these operators exist because the north rule targets
10^12 Common-Crawl pages, where multi-capture urls and per-site skew
are the dominant data-shape facts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

__all__ = [
    "captures_table",
    "captures_cte_duck",
    "latest_capture",
    "domain_stats",
    "extract_text",
    "extract_text_expr",
    "url_variants_expr",
    "TRACKING_PARAM_RE",
    "canonical_url_expr",
    "url_param_variants_expr",
    "canonical_urls",
    "canonical_urls_sql_duck",
    "surt_key_expr",
    "surt_keys",
    "surt_canonical_sql_duck",
    "cdx_captures",
    "cdx_prefix_bounds",
    "cdx_range_scan",
    "cdx_range_scan_sql_duck",
    "snapshot_pair",
    "snapshot_diff",
    "snapshot_diff_sql_duck",
]

# deterministic multi-capture synth: each url has 1 + (doc_id % 3)
# captures, one day apart, starting at a per-url jittered base hour.
_TS_BASE = 1704067200
_TS_JITTER_MOD = 2592000  # 30 days
_DAY = 86400


def captures_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-capture crawl index: (url, capture, capture_ts) with
    1-3 deterministic captures per url (CDX shape). url matches
    sources/pages.py exactly, so captures join pages on url."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        docs.select(
            F.concat(
                F.lit("https://example.org/"),
                F.col("source"),
                F.lit("/page-"),
                F.col("doc_id").cast("string"),
            ).alias("url"),
            "doc_id",
            "lang",
            "text",
        )
        .withColumn(
            "capture", F.explode(F.sequence(F.lit(0), F.col("doc_id") % 3))
        )
        .withColumn(
            "capture_ts",
            F.lit(_TS_BASE)
            + (F.col("doc_id") * 17) % _TS_JITTER_MOD
            + F.col("capture") * _DAY,
        )
    )


def captures_cte_duck() -> str:
    """The identical relation as DuckDB SQL (oracle lockstep):
    VALUES-filter enumeration == Spark's explode(sequence(0, id%3))."""
    return (
        "caps AS (SELECT "
        "'https://example.org/' || source || '/page-' || CAST(doc_id AS VARCHAR) AS url, "
        "doc_id, lang, text, c AS capture, "
        f"{_TS_BASE} + (doc_id * 17) % {_TS_JITTER_MOD} + c * {_DAY} AS capture_ts "
        "FROM documents, (VALUES (0), (1), (2)) AS v(c) "
        "WHERE c <= doc_id % 3)"
    )


def latest_capture(captures: DataFrame) -> DataFrame:
    """CDX dedup: the LATEST capture row per url, plus how many captures
    it superseded — the first operator every recrawl pipeline runs.

    Plan: ONE shuffle on url (window rank + count share the same
    partitioning, Catalyst plans a single exchange). Keeps the full
    payload row — this is "pick the row", not "aggregate the rows", so
    a groupBy(max) would lose every non-key column. At 10^12 pages the
    url partitioning is near-uniform (hash of full url), so no salting
    is needed; AQE handles residual skew from duplicate-heavy hosts.
    """
    w = Window.partitionBy("url")
    ranked = captures.withColumn(
        "_rk",
        F.row_number().over(w.orderBy(F.col("capture_ts").desc(), F.col("capture").desc())),
    ).withColumn("n_captures", F.count(F.lit(1)).over(w))
    return ranked.filter(F.col("_rk") == 1).drop("_rk")


def domain_stats(pages: DataFrame) -> DataFrame:
    """Per-site corpus rollup: page count, language spread, total
    extracted chars. The site key is the first path segment (this synth
    corpus varies the path, not the host; in production the same
    operator groups by registered domain — one regexp swap).

    Plan: regexp extract (JVM codegen) + ONE hash aggregate with
    map-side combine; count_distinct(lang) is a tiny per-site set.
    Per-site skew (a few giant hosts) is the classic web-corpus hot
    key — AQE skew-split applies; the aggregate itself is associative
    so partial aggregation already absorbs most of it map-side.
    """
    site = F.regexp_extract(F.col("url"), r"^https://[^/]+/([^/]+)/", 1)
    return (
        pages.withColumn("site", site)
        .groupBy("site")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.countDistinct("lang").alias("n_langs"),
            F.sum(F.length("text")).alias("sum_chars"),
        )
    )


# -------------------------------------------------- SURT canonicalization
def url_variants_expr(e, id_col: str, source_col: str,
                      variant_col: str | None = None) -> str:
    """Deterministic MESSY url synth (round-3): the same logical page in
    four spellings keyed by ``variant_col % 4`` (default: the id) —
    clean https, uppercase scheme + WWW + uppercase host, explicit
    default :443, and a www2/mixed-case/:80 variant. All four
    canonicalize to one SURT key; this is the adversarial input the
    canonicalizer is tested and oracle-checked against (engine-portable
    string expressions). Pass ``variant_col`` to vary the SPELLING
    independently of the page identity (e.g. per capture, so one page's
    recrawls arrive multi-spelled — the real CDX input shape)."""
    variant = variant_col if variant_col is not None else id_col
    path = f"CONCAT('/', {source_col}, '/page-', CAST({id_col} AS VARCHAR))" \
        if e.name == "duck" else \
        f"CONCAT('/', {source_col}, '/page-', CAST({id_col} AS STRING))"
    return (
        f"CASE CAST(({variant}) % 4 AS INT) "
        f"WHEN 0 THEN CONCAT('https://example.org', {path}) "
        f"WHEN 1 THEN CONCAT('HTTP://WWW.EXAMPLE.ORG', {path}) "
        f"WHEN 2 THEN CONCAT('https://example.org:443', {path}) "
        f"ELSE CONCAT('http://www2.Example.Org:80', {path}) END"
    )


def surt_key_expr(e, url_col: str) -> str:
    """SURT key (Sort-friendly URI Reordering Transform — the Common
    Crawl / Internet Archive CDX index key; public spec at
    github.com/internetarchive/surt) of a url expression:

    scheme stripped → host lowercased → leading www\\d*. dropped →
    default :80/:443 port dropped → host labels REVERSED and
    comma-joined → ``)`` → path (case-preserved, '/' if empty).

    Reversed-host ordering is what makes the key an index: all pages of
    a registrable domain share a key prefix, so CDX range scans and the
    zkey's prefix algebra are the same trick in string space. Pure
    engine-portable string/regexp expressions — no UDF."""
    nos = e.re_replace_all(f"CAST({url_col} AS {'STRING' if e.name == 'spark' else 'VARCHAR'})",
                           r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    authority = f"LOWER(regexp_extract({nos}, '^([^/]*)', 1))"
    authority = e.re_replace_all(authority, r":(80|443)$", "")
    authority = e.re_replace_all(authority, r"^www[0-9]*\.", "")
    # non-default port: strip before the label reversal, re-append after
    # (SURT format: "tld,domain,sub:8080)/path")
    host = e.re_replace_all(authority, r":[0-9]+$", "")
    port = f"regexp_extract({authority}, ':([0-9]+)$', 1)"
    port_sfx = f"CASE WHEN LENGTH({port}) = 0 THEN '' ELSE CONCAT(':', {port}) END"
    raw_path = f"SUBSTRING({nos}, LENGTH(regexp_extract({nos}, '^([^/]*)', 1)) + 1)"
    path = f"CASE WHEN LENGTH({raw_path}) = 0 THEN '/' ELSE {raw_path} END"
    if e.name == "spark":
        rev = f"array_join(reverse(split({host}, '\\\\.')), ',')"
    else:
        rev = f"array_to_string(list_reverse(string_split({host}, '.')), ',')"
    return f"CONCAT({rev}, {port_sfx}, ')', {path})"


def surt_keys(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """Adds ``surt_key`` — a narrow map; downstream `latest_capture` /
    dedup / domain rollups group on the canonical key instead of the raw
    url, which is how a 10^12-page CDX index actually keys (multi-spelled
    urls of one page collapse BEFORE the shuffle, not after)."""
    from linear_quadtree_spark.functions.textexpr import SPARK

    return pages.withColumn("surt_key", F.expr(surt_key_expr(SPARK, url_col)))


def surt_canonical_sql_duck(src: str = "documents", id_col: str = "doc_id") -> str:
    """DuckDB twin of the registry's surt_canonical query (same variant
    synth, same SURT expressions)."""
    from linear_quadtree_spark.functions.textexpr import DUCK

    u = url_variants_expr(DUCK, id_col, "source")
    surt = surt_key_expr(DUCK, "u")
    return f"""
WITH v AS (SELECT {id_col}, {u} AS u FROM {src})
SELECT {id_col}, u AS url, {surt} AS surt_key FROM v
"""


# ----------------------------------------------------- CDX range scan
def cdx_captures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-capture, MULTI-SPELLED crawl index: like `captures_table`
    but each capture of a page arrives under a different url spelling
    (variant keyed by ``doc_id + capture``) — the real CDX input shape,
    where recrawls of one page disagree on scheme/www/port and only the
    SURT key reunites them."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    from linear_quadtree_spark.functions.textexpr import SPARK

    caps = docs.select("doc_id", "source").withColumn(
        "capture", F.explode(F.sequence(F.lit(0), F.col("doc_id") % 3))
    ).withColumn(
        "capture_ts",
        F.lit(_TS_BASE)
        + (F.col("doc_id") * 17) % _TS_JITTER_MOD
        + F.col("capture") * _DAY,
    )
    u = url_variants_expr(SPARK, "doc_id", "source",
                          variant_col="(doc_id + capture)")
    return caps.withColumn("url", F.expr(u))


def cdx_prefix_bounds(prefix: str) -> tuple[str, str]:
    """[lo, hi) string bounds of a SURT prefix scan: the standard CDX
    range idiom — ``hi`` is the prefix with its last byte incremented,
    so ``key >= lo AND key < hi`` is exactly "key starts with prefix"
    for ASCII keys, expressed as a SARGABLE closed-open range (reaches
    parquet min/max stats and a sorted index's seek, where a LIKE
    cannot)."""
    return prefix, prefix[:-1] + chr(ord(prefix[-1]) + 1)


def cdx_range_scan(captures: DataFrame, prefix: str,
                   url_col: str = "url") -> DataFrame:
    """CDX index lookup: canonicalize → range-scan a SURT prefix →
    latest capture per canonical key. This is the query a 10^12-page
    crawl index answers all day ("give me the current copy of every
    page under example.org/arxiv/"), and it is the string-space twin of
    `bbox_query`'s zkey range scan: prefix algebra on a sort key, a
    closed-open range per prefix, exact refine by window rank.

    Plan: narrow map (SURT expressions), sargable string-range filter
    (pushes to the scan on a surt-sorted table), then ONE shuffle on
    surt_key for the rank+count window — the `latest_capture` shape on
    the canonical key instead of the raw url."""
    from linear_quadtree_spark.functions.textexpr import SPARK

    lo, hi = cdx_prefix_bounds(prefix)
    keyed = captures.withColumn(
        "surt_key", F.expr(surt_key_expr(SPARK, url_col))
    ).filter((F.col("surt_key") >= lo) & (F.col("surt_key") < hi))
    w = Window.partitionBy("surt_key")
    ranked = keyed.withColumn(
        "_rk",
        F.row_number().over(
            w.orderBy(F.col("capture_ts").desc(), F.col("capture").desc())
        ),
    ).withColumn("n_captures", F.count(F.lit(1)).over(w))
    return ranked.filter(F.col("_rk") == 1).select(
        "surt_key", "doc_id", url_col, "capture_ts", "n_captures"
    )


def cdx_range_scan_sql_duck(prefix: str, src: str = "documents") -> str:
    """DuckDB twin of cdx_captures + cdx_range_scan (same variant synth,
    same SURT expressions, same closed-open bounds)."""
    from linear_quadtree_spark.functions.textexpr import DUCK

    lo, hi = cdx_prefix_bounds(prefix)
    u = url_variants_expr(DUCK, "doc_id", "source",
                          variant_col="(doc_id + c)")
    surt = surt_key_expr(DUCK, "url")
    return f"""
WITH caps AS (
  SELECT doc_id, c AS capture,
         {_TS_BASE} + (doc_id * 17) % {_TS_JITTER_MOD} + c * {_DAY}
           AS capture_ts,
         {u} AS url
  FROM {src}, (VALUES (0), (1), (2)) AS v(c)
  WHERE c <= doc_id % 3),
keyed AS (
  SELECT *, {surt} AS surt_key FROM caps
  WHERE {surt} >= '{lo}' AND {surt} < '{hi}'),
r AS (
  SELECT surt_key, doc_id, url, capture_ts,
         ROW_NUMBER() OVER (PARTITION BY surt_key
                            ORDER BY capture_ts DESC, capture DESC) AS rk,
         COUNT(*) OVER (PARTITION BY surt_key) AS n_captures
  FROM keyed)
SELECT surt_key, doc_id, url, capture_ts,
       CAST(n_captures AS BIGINT) AS n_captures
FROM r WHERE rk = 1
"""


# -------------------------------------------------------- text extraction
#: entity decode order matters: named/numeric entities first, &amp; LAST
#: (single-pass decode; '&amp;lt;' correctly yields '&lt;', not '<').
_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"),
             ("&amp;", "&")]


def extract_text_expr(e, html_str: str) -> str:
    """Engine-portable extraction over an html STRING expression: strip
    tags, then decode the 5 core entities. Deliberately minimal and
    exactly reproducible — the point is a deterministic, byte-stable
    transform (the north rule's per-url text invariant), not a browser."""
    out = e.re_replace_all(html_str, r"<[^>]*>", "")
    for ent, ch in _ENTITIES:
        rep = ch.replace("'", "\\'") if e.name == "spark" else ch.replace("'", "''")
        out = f"replace({out}, '{ent}', '{rep}')"
    return out


def extract_text(
    pages: DataFrame, html_col: str = "html", out_col: str = "extracted_text"
) -> DataFrame:
    """Adds ``out_col``: text extracted from the binary html payload.

    Scale shape: CAST(binary AS STRING) + regexp_replace + 5 replace()
    calls — one narrow JVM projection inside whole-stage codegen, no
    UDF, no shuffle; at 100 TB the parquet scan is the entire cost and
    the binary column never crosses a Python boundary."""
    from linear_quadtree_spark.functions.textexpr import SPARK

    return pages.withColumn(
        out_col, F.expr(extract_text_expr(SPARK, f"CAST({html_col} AS STRING)"))
    )


# ------------------------------------------------------------ snapshot diff
#: deterministic snapshot-mutation moduli (test-scale synth): pages with
#: doc_id % 7 == 3 vanish from the new crawl, % 7 == 5 change content,
#: and every % 11 == 0 page spawns one new url (id + _DIFF_NEW_OFFSET).
_DIFF_GONE_MOD = 7
_DIFF_GONE_RES = 3
_DIFF_CHG_RES = 5
_DIFF_NEW_MOD = 11
_DIFF_NEW_OFFSET = 1_000_000


def _doc_url(id_col: str = "doc_id", source_col: str = "source"):
    return F.concat(
        F.lit("https://example.org/"),
        F.col(source_col),
        F.lit("/page-"),
        F.col(id_col).cast("string"),
    )


def snapshot_pair(spark: SparkSession, sf_dir: str):
    """Deterministic (old, new) crawl-snapshot pair over the documents
    table: the new snapshot drops some pages, rewrites the text of
    others, and adds fresh urls — the CDX-diff input shape."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = docs.select(_doc_url().alias("url"), "doc_id", "text")
    old = base.select("url", "text")
    kept = base.filter(
        F.col("doc_id") % _DIFF_GONE_MOD != _DIFF_GONE_RES
    ).select(
        "url",
        F.when(
            F.col("doc_id") % _DIFF_GONE_MOD == _DIFF_CHG_RES,
            F.concat(F.coalesce(F.col("text"), F.lit("")), F.lit(" updated")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    added = docs.filter(F.col("doc_id") % _DIFF_NEW_MOD == 0).select(
        F.concat(
            F.lit("https://example.org/"),
            F.col("source"),
            F.lit("/page-"),
            (F.col("doc_id") + _DIFF_NEW_OFFSET).cast("string"),
        ).alias("url"),
        "text",
    )
    return old, kept.unionByName(added)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """Cross-snapshot page diff: (url, status, old_len, new_len) with
    status ∈ {added, gone, changed, same} — the recrawl triage every
    incremental crawl pipeline runs before it decides what to refetch,
    re-extract, or tombstone.

    Content equality is the 60-bit composite fingerprint on (fp1, fp2,
    length) — `operators/text.fingerprint`'s exact-dedup key, sized for
    10^12 pages — computed as a map-only projection on EACH side, so
    the full outer join moves two slim (key, fp1, fp2, len) relations,
    never the page payloads. One shuffle total (the join); at scale
    both snapshots arrive surt-sorted and the join is a co-partitioned
    sort-merge. Missing lengths report -1 (never NULL) so downstream
    filters stay sargable."""
    from linear_quadtree_spark.functions.textexpr import (
        B2,
        P2,
        SEED2,
        SPARK,
        text_fp_expr,
    )

    def slim(df: DataFrame, tag: str) -> DataFrame:
        return df.select(
            F.col(key_col),
            F.expr(text_fp_expr(SPARK, text_col)).alias(f"{tag}_fp1"),
            F.expr(text_fp_expr(SPARK, text_col, P2, B2, SEED2)).alias(f"{tag}_fp2"),
            F.expr(f"length(coalesce({text_col}, ''))")
            .cast("long")
            .alias(f"{tag}_len"),
        )
    o = slim(old, "o")
    n = slim(new, "n")
    joined = o.join(n, key_col, "full_outer")
    return joined.select(
        F.col(key_col),
        F.when(F.col("o_len").isNull(), F.lit("added"))
        .when(F.col("n_len").isNull(), F.lit("gone"))
        .when(
            (F.col("o_fp1") == F.col("n_fp1"))
            & (F.col("o_fp2") == F.col("n_fp2"))
            & (F.col("o_len") == F.col("n_len")),
            F.lit("same"),
        )
        .otherwise(F.lit("changed"))
        .alias("status"),
        F.coalesce(F.col("o_len"), F.lit(-1).cast("long")).alias("old_len"),
        F.coalesce(F.col("n_len"), F.lit(-1).cast("long")).alias("new_len"),
    )


def snapshot_diff_sql_duck(src: str = "documents", text_col: str = "text") -> str:
    """DuckDB twin of snapshot_pair + snapshot_diff (same synth
    mutations, same fingerprint expressions, same status rules)."""
    from linear_quadtree_spark.functions.textexpr import (
        B2,
        DUCK,
        P2,
        SEED2,
        text_fp_expr,
    )

    fp1 = text_fp_expr(DUCK, text_col)
    fp2 = text_fp_expr(DUCK, text_col, P2, B2, SEED2)
    url = f"'https://example.org/' || source || '/page-' || CAST(doc_id AS VARCHAR)"
    url_new = (
        "'https://example.org/' || source || '/page-' || "
        f"CAST(doc_id + {_DIFF_NEW_OFFSET} AS VARCHAR)"
    )
    return f"""
WITH old_snap AS (SELECT {url} AS url, {text_col} FROM {src}),
new_snap AS (
  SELECT {url} AS url,
         CASE WHEN doc_id % {_DIFF_GONE_MOD} = {_DIFF_CHG_RES}
              THEN COALESCE({text_col}, '') || ' updated'
              ELSE {text_col} END AS {text_col}
  FROM {src} WHERE doc_id % {_DIFF_GONE_MOD} <> {_DIFF_GONE_RES}
  UNION ALL
  SELECT {url_new} AS url, {text_col}
  FROM {src} WHERE doc_id % {_DIFF_NEW_MOD} = 0),
o AS (SELECT url, {fp1} AS o_fp1, {fp2} AS o_fp2,
             CAST(LENGTH(COALESCE({text_col}, '')) AS BIGINT) AS o_len
      FROM old_snap),
n AS (SELECT url, {fp1} AS n_fp1, {fp2} AS n_fp2,
             CAST(LENGTH(COALESCE({text_col}, '')) AS BIGINT) AS n_len
      FROM new_snap)
SELECT COALESCE(o.url, n.url) AS url,
       CASE WHEN o_len IS NULL THEN 'added'
            WHEN n_len IS NULL THEN 'gone'
            WHEN o_fp1 = n_fp1 AND o_fp2 = n_fp2 AND o_len = n_len THEN 'same'
            ELSE 'changed' END AS status,
       COALESCE(o_len, CAST(-1 AS BIGINT)) AS old_len,
       COALESCE(n_len, CAST(-1 AS BIGINT)) AS new_len
FROM o FULL OUTER JOIN n ON o.url = n.url
"""


# ------------------------------------------------- query canonicalization
#: tracking / session parameters every public canonicalizer strips
#: (the utm_* family is Google Analytics' public spec; click ids and
#: session ids are the standard additions)
TRACKING_PARAM_RE = (
    r"^(utm_[a-z0-9]+|gclid|fbclid|msclkid|dclid|ref|ref_src"
    r"|mc_cid|mc_eid|sessionid|phpsessid|jsessionid|sid)="
)


def _rlike(e, s: str, pat: str) -> str:
    if e.name == "spark":
        esc = pat.replace("\\", "\\\\")
        return f"({s} RLIKE '{esc}')"
    return f"regexp_matches({s}, '{pat}')"


def canonical_url_expr(e, url_col: str) -> str:
    """Query-level URL canonicalization — the facet SURT leaves to the
    caller: drop the fragment, drop tracking/session parameters
    (TRACKING_PARAM_RE), SORT the surviving parameters (param order is
    not semantic), and reassemble. Composes with surt_key_expr (host
    facet) for the full canonical key. Pure engine-portable
    string/regexp/HOF expressions — no UDF."""
    base = e.re_replace_all(
        f"CAST({url_col} AS {'STRING' if e.name == 'spark' else 'VARCHAR'})",
        r"#.*$",
        "",
    )
    pre = f"regexp_extract({base}, '^([^?]*)', 1)"
    query = f"regexp_extract({base}, '[?](.*)$', 1)"
    params = e.filt(
        e.split_re(f"({query})", r"&"),
        "pr",
        f"pr <> '' AND NOT {_rlike(e, 'pr', TRACKING_PARAM_RE)}",
    )
    joined = (
        f"array_join({e.asort(params)}, '&')"
        if e.name == "spark"
        else f"list_aggregate({e.asort(params)}, 'string_agg', '&')"
    )
    return (
        f"CASE WHEN coalesce({joined}, '') = '' THEN {pre} "
        f"ELSE CONCAT({pre}, '?', {joined}) END"
    )


def url_param_variants_expr(e, id_col: str) -> str:
    """Deterministic messy-QUERY url synth: four query spellings of the
    same logical page (page identity = ``id div 4`` — consecutive ids
    are the same page in different spellings) — tracking params
    appended, param order permuted, a fragment added — all of which
    canonical_url_expr collapses to ``...?id=<page>&v=1``."""
    cast = "STRING" if e.name == "spark" else "VARCHAR"
    page = f"CAST(({id_col}) div 4 AS {cast})" if e.name == "spark" else f"CAST(({id_col}) // 4 AS {cast})"
    base = f"CONCAT('https://example.org/catalog/item-', {page})"
    return (
        f"CASE CAST(({id_col}) % 4 AS INT) "
        f"WHEN 0 THEN CONCAT({base}, '?id=', {page}, '&v=1') "
        f"WHEN 1 THEN CONCAT({base}, '?v=1&id=', {page}, '&utm_source=feed') "
        f"WHEN 2 THEN CONCAT({base}, '?utm_campaign=x&gclid=abc&id=', {page}, '&v=1') "
        f"ELSE CONCAT({base}, '?id=', {page}, '&v=1#section-2') END"
    )


def canonical_urls(pages: DataFrame, url_col: str = "url", id_col: str = "doc_id") -> DataFrame:
    """Canonical-URL dedup rollup: (canonical_url, n_variants, n_pages,
    first_id) — the crawl-frontier collapse that keeps one fetch per
    logical page. One narrow map (the canonicalizer) + one hash
    aggregate keyed by the canonical string; distinct-variant counting
    rides the same aggregate."""
    from linear_quadtree_spark.functions.textexpr import SPARK

    canon = canonical_url_expr(SPARK, url_col)
    return (
        pages.select(
            F.col(id_col), F.col(url_col), F.expr(canon).alias("canonical_url")
        )
        .groupBy("canonical_url")
        .agg(
            F.countDistinct(url_col).alias("n_variants"),
            F.count(F.lit(1)).alias("n_pages"),
            F.min(id_col).alias("first_id"),
        )
    )


def canonical_urls_sql_duck(src: str = "documents", id_col: str = "doc_id") -> str:
    """DuckDB twin over the same messy synth."""
    from linear_quadtree_spark.functions.textexpr import DUCK

    u = url_param_variants_expr(DUCK, id_col)
    canon = canonical_url_expr(DUCK, "url")
    return f"""
WITH pages AS (SELECT {id_col}, {u} AS url FROM {src}),
canon AS (SELECT {id_col}, url, {canon} AS canonical_url FROM pages)
SELECT canonical_url,
       CAST(COUNT(DISTINCT url) AS BIGINT) AS n_variants,
       COUNT(*) AS n_pages,
       MIN({id_col}) AS first_id
FROM canon GROUP BY 1
"""
