"""Host-graph operators over the Common-Crawl-style page table.

The web corpus the north rule targets is a *graph* as much as a table:
crawl prioritization, spam discounting, and training-data quality
weighting all start from link-derived host scores (the public
Common-Crawl host-level ranking line of work). The reference engine has
no graph layer (it is a pure spatial kernel, lqt.h:1-30); this module
exists for the same reason the crawl-index layer does — it is the
data-shape the 10^12-page target actually has.

`pagerank` is the real distributed operator: it takes ANY (src, dst)
edge DataFrame and runs a FIXED number of power-iteration rounds in
pure integer arithmetic, so the result is bit-identical to the DuckDB
unrolled-CTE twin (no floating sums whose order could differ across
engines, no convergence test whose tolerance could flip a row).
`host_link_edges` is the deterministic test-scale synthesizer (the
sandbox corpus has no real anchors); at production scale the edge table
comes from anchor extraction and this generator is never on the path.

Scale shape (SCALE.md "host_pagerank"): per iteration exactly two
shuffles — ranks hash-join edges on src (edges pre-partitioned once,
cached with their out-degree), then one hash aggregate on dst. The
iteration count is a constant (default 3), not data-dependent: the
driver holds NO per-round scalar and the loop unrolls into one static
plan. Rank state is one row per host (~10^8 at web scale — a thin
shuffle, never collected).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from linear_quadtree_spark.cache import track

__all__ = [
    "host_link_edges",
    "pagerank",
    "host_pagerank_sql_duck",
    "pagerank_unroll_ctes_duck",
    "hits_scores",
    "hits_unroll_ctes_duck",
    "host_hits_sql_duck",
    "host_link_anchors",
    "anchor_terms",
    "anchor_terms_sql_duck",
]

# deterministic synthetic link map: page doc_id links its host to host
# index ((doc_id*A + C) mod P mod N)² div N — an LCG step scrambled
# through a large prime, then squared so in-degree is SKEWED (low-index
# hosts are hubs, the web's real shape), all in engine-portable integer
# arithmetic.
_EDGE_A = 1103515245
_EDGE_C = 12345
_EDGE_P = 1000003

PR_SCALE = 10**12  # fixed-point 1.0 == 10^12 (total mass fits int64)
PR_D_NUM = 85  # damping d = 85/100
PR_D_DEN = 100
PR_ITERS = 3


def host_link_edges(
    spark: SparkSession,
    sf_dir: str,
    id_col: str = "doc_id",
    host_col: str = "source",
) -> DataFrame:
    """Deterministic test-scale host link graph: each page contributes
    the directed edge (its host → host[(doc_id*A + C) mod N]), self
    loops dropped, edges distinct, in-degree quadratically skewed
    toward low host indices (hub shape). The window over the host
    dimension is fine HERE because hosts are a tiny synth dimension; a
    production edge table comes from anchor extraction (url → surt →
    host) and never needs a dense index."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    hosts = (
        docs.select(F.col(host_col).alias("host"))
        .distinct()
        .select(
            "host",
            (F.row_number().over(Window.orderBy("host")) - 1).alias("idx"),
        )
    )
    n = F.broadcast(hosts.agg(F.count(F.lit(1)).alias("n_hosts")))
    return (
        docs.crossJoin(n)
        .select(
            F.col(host_col).alias("src"),
            F.expr(
                f"((({id_col} * {_EDGE_A} + {_EDGE_C}) % {_EDGE_P} % n_hosts)"
                f" * ((({id_col} * {_EDGE_A} + {_EDGE_C}) % {_EDGE_P}) % n_hosts))"
                " div n_hosts"
            ).alias("_didx"),
        )
        .join(F.broadcast(hosts), F.col("_didx") == F.col("idx"))
        .filter(F.col("src") != F.col("host"))
        .select("src", F.col("host").alias("dst"))
        .distinct()
    )


def pagerank(
    edges: DataFrame,
    iters: int = PR_ITERS,
    d_num: int = PR_D_NUM,
    d_den: int = PR_D_DEN,
    scale: int = PR_SCALE,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Fixed-point integer PageRank over a distinct (src, dst) edge
    DataFrame → (host, rank_fp) with rank_fp = rank · 10^12.

    The recurrence, in int64 end to end:

        rank_0(v)   = scale DIV N
        contrib(u→v) = rank(u) DIV out_deg(u)
        rank_i+1(v) = (scale·(1−d) DIV 1) DIV N
                      + (d_num · Σ_u contrib(u→v)) DIV d_den

    Every operation is integer (DIV is floor division on positive
    operands in both Spark and DuckDB), so summation order cannot
    change the result and the DuckDB twin is value-hash identical.
    Dangling mass (hosts with no out-edges) drops, the standard
    simplification — identical in both engines by construction.
    Total in-flight mass is ≤ scale = 10^12 and d_num·mass ≤ 8.5·10^13,
    comfortably inside int64.

    Plan: edges carry their out-degree in ONE cached relation
    (edges ⋈ degree, pre-shuffled on src); each of the `iters` rounds
    is a hash join of the thin rank state onto that relation plus one
    hash aggregate on dst — two shuffles per round, zero driver
    round-trips, a single static unrolled plan."""
    edges = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    nodes = track(
        edges.select(F.col("src").alias("host"))
        .union(edges.select(F.col("dst").alias("host")))
        .distinct()
    )
    n = F.broadcast(nodes.agg(F.count(F.lit(1)).alias("n_hosts")))
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    edges_deg = track(edges.join(deg, "src").repartition("src"))
    base = f"((CAST({scale} AS BIGINT) * {d_den - d_num}) div {d_den}) div n_hosts"
    ranks = nodes.crossJoin(n).select(
        "host", F.expr(f"CAST({scale} AS BIGINT) div n_hosts").alias("rank_fp")
    )
    for _ in range(iters):
        contrib = edges_deg.join(
            ranks.select(F.col("host").alias("src"), "rank_fp"), "src"
        ).select(
            F.col("dst").alias("host"),
            F.expr("rank_fp div out_deg").alias("_c"),
        )
        inflow = contrib.groupBy("host").agg(
            F.sum("_c").cast("long").alias("_c_in")
        )
        ranks = (
            nodes.crossJoin(n)
            .join(inflow, "host", "left")
            .select(
                "host",
                F.expr(
                    f"{base} + ({d_num} * coalesce(_c_in, CAST(0 AS BIGINT))) div {d_den}"
                ).alias("rank_fp"),
            )
        )
    return ranks.select("host", "rank_fp")


def pagerank_unroll_ctes_duck(
    iters: int = PR_ITERS,
    d_num: int = PR_D_NUM,
    d_den: int = PR_D_DEN,
    scale: int = PR_SCALE,
    out_col: str = "host",
) -> str:
    """The generic unrolled integer-PageRank CTE chain over an ``edges``
    CTE with (src, dst) columns — embed after ``WITH ... edges AS (...)``.
    Ends with ``SELECT host, rank_fp``; callers alias as needed. DuckDB
    SUM(BIGINT) widens to HUGEINT, so every sum is cast back before it
    meets the int64 arithmetic."""
    big = "CAST({v} AS BIGINT)".format
    q = f"""
nodes AS (SELECT src AS host FROM edges UNION SELECT dst AS host FROM edges),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_hosts FROM nodes),
deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS out_deg FROM edges GROUP BY 1),
ed AS (SELECT e.src, e.dst, g.out_deg FROM edges e JOIN deg g USING (src)),
r0 AS (SELECT host, {big(v=scale)} // n_hosts AS rank_fp FROM nodes CROSS JOIN nn)
"""
    prev = "r0"
    for i in range(1, iters + 1):
        q += f""",
c{i} AS (
  SELECT ed.dst AS host,
         CAST(SUM(r.rank_fp // ed.out_deg) AS BIGINT) AS c_in
  FROM ed JOIN {prev} r ON r.host = ed.src GROUP BY 1),
r{i} AS (
  SELECT nodes.host,
         (({big(v=scale)} * {d_den - d_num}) // {d_den}) // n_hosts
           + ({d_num} * COALESCE(c_in, {big(v=0)})) // {d_den} AS rank_fp
  FROM nodes CROSS JOIN nn LEFT JOIN c{i} USING (host))
"""
        prev = f"r{i}"
    alias = "" if out_col == "host" else f" AS {out_col}"
    return q + f"SELECT host{alias}, rank_fp FROM {prev}"


def _host_edges_ctes_duck(src: str) -> str:
    """Shared CTE prefix (hs/hosts/hn/edges) synthesizing the SAME
    deterministic host link graph host_link_edges builds — ONE copy so
    the Spark/DuckDB twins cannot silently diverge per operator."""
    return f"""hs AS (SELECT DISTINCT source AS host FROM {src}),
hosts AS (SELECT host, ROW_NUMBER() OVER (ORDER BY host) - 1 AS idx FROM hs),
hn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_hosts FROM hosts),
edges AS (
  SELECT DISTINCT d.source AS src, h.host AS dst
  FROM {src} d CROSS JOIN hn
  JOIN hosts h ON (
    (((d.doc_id * {_EDGE_A} + {_EDGE_C}) % {_EDGE_P} % hn.n_hosts)
     * (((d.doc_id * {_EDGE_A} + {_EDGE_C}) % {_EDGE_P}) % hn.n_hosts))
    // hn.n_hosts) = h.idx
  WHERE d.source <> h.host)"""


def host_pagerank_sql_duck(
    src: str = "documents",
    iters: int = PR_ITERS,
    d_num: int = PR_D_NUM,
    d_den: int = PR_D_DEN,
    scale: int = PR_SCALE,
) -> str:
    """DuckDB twin of host_link_edges + pagerank: the same integer
    recurrence unrolled as chained CTEs (a different plan family from
    the Spark loop — relational unroll vs iterative joins — same rows
    bit for bit)."""
    return (
        "WITH "
        + _host_edges_ctes_duck(src)
        + ",\n"
        + pagerank_unroll_ctes_duck(iters, d_num, d_den, scale)
    )


HITS_ITERS = 3


def hits_scores(
    edges: DataFrame,
    iters: int = HITS_ITERS,
    scale: int = PR_SCALE,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Fixed-point integer HITS (Kleinberg 1999) over a distinct
    (src, dst) edge DataFrame → (host, hub_fp, auth_fp).

    The recurrence per round, int64 end to end:

        auth_raw(v) = Σ_{u→v} hub(u)
        q_a         = max(1, max_v auth_raw DIV scale)
        auth(v)     = auth_raw(v) DIV q_a          -- ≈ scale·a/amax
        hub_raw(u)  = Σ_{u→v} auth(v)              -- uses the NEW auth
        q_h, hub(u) analogous

    The divide-by-quotient normalization (instead of the float
    a·scale/amax) keeps every intermediate ≤ in_degree_max · scale —
    int64-safe at any graph size — while staying a pure integer
    formula both engines evaluate identically; the deliberate rounding
    is part of the operator's definition (bit-reproducible beats
    last-ulp-faithful here, the pagerank argument).

    Plan: like pagerank — per round two hash joins of the thin score
    state onto the cached edge relation + two aggregates. UNLIKE
    pagerank the recurrence needs a data-dependent scalar (the max) per
    half-round; it rides to the driver as ONE tiny aggregate job and
    embeds as a LITERAL divisor (the kNN-ring discipline: a scalar per
    round, never a relation). The first formulation kept the max as a
    broadcast subtree instead — broadcast subtrees execute as separate
    concurrent jobs that re-ran the whole prior lineage (measured 70+ s
    for a 20-host graph); the scalar + per-round persist makes the
    final plan flat projections over cached state. The DuckDB twin
    needs the matching treatment (MATERIALIZED round CTEs — DuckDB
    inlines CTEs by default, with exponential re-evaluation)."""
    edges = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    nodes = track(
        edges.select(F.col("src").alias("host"))
        .union(edges.select(F.col("dst").alias("host")))
        .distinct()
    )
    e = track(edges.repartition("src"))
    hub = nodes.select("host", F.expr(f"CAST({scale} AS BIGINT)").alias("hub_fp"))
    # iters=0 contract (the pagerank family rule): return the initial
    # state — hub = auth = scale for every node
    auth = nodes.select(
        "host", F.expr(f"CAST({scale} AS BIGINT)").alias("auth_fp")
    )

    def _normalize(raw_col: str, full: DataFrame, out: str) -> DataFrame:
        # ONE tiny job: the max rides back as a scalar and embeds as a
        # LITERAL divisor, so no broadcast subtree ever re-runs the
        # round lineage (the agg scan also populates `full`'s cache)
        m = full.agg(F.max(raw_col).alias("m")).collect()[0]["m"] or 0
        q = max(1, int(m) // scale)
        return full.select(
            "host", F.expr(f"{raw_col} div CAST({q} AS BIGINT)").alias(out)
        )

    # Only the LIVE (afull, hfull) pair stays cached: once round i's
    # state has materialized (the collect() inside _normalize is the
    # barrier), round i-1's relation is dead and is unpersisted —
    # without this, 2*iters node-sized cached DataFrames accumulate in
    # executor storage until the next global release boundary (ADVICE
    # r3). The final pair is left cached for the returned join.
    prev_afull = prev_hfull = None
    for _ in range(iters):
        araw = (
            e.join(hub.select(F.col("host").alias("src"), "hub_fp"), "src")
            .groupBy(F.col("dst").alias("host"))
            .agg(F.sum("hub_fp").cast("long").alias("_a"))
        )
        afull = track(
            nodes.join(araw, "host", "left").select(
                "host", F.coalesce(F.col("_a"), F.lit(0)).cast("long").alias("_a")
            )
        )
        auth = _normalize("_a", afull, "auth_fp")  # afull now cached
        if prev_hfull is not None:
            prev_hfull.unpersist()
        hraw = (
            e.join(auth.select(F.col("host").alias("dst"), "auth_fp"), "dst")
            .groupBy(F.col("src").alias("host"))
            .agg(F.sum("auth_fp").cast("long").alias("_h"))
        )
        hfull = track(
            nodes.join(hraw, "host", "left").select(
                "host", F.coalesce(F.col("_h"), F.lit(0)).cast("long").alias("_h")
            )
        )
        hub = _normalize("_h", hfull, "hub_fp")  # hfull now cached
        if prev_afull is not None:
            prev_afull.unpersist()
        prev_afull, prev_hfull = afull, hfull
    return hub.join(auth, "host").select("host", "hub_fp", "auth_fp")


def hits_unroll_ctes_duck(iters: int = HITS_ITERS, scale: int = PR_SCALE) -> str:
    """The identical integer-HITS recurrence unrolled as chained CTEs
    over an ``edges`` CTE with (src, dst) — embed after
    ``WITH ... edges AS (...),``. Ends with
    ``SELECT host, hub_fp, auth_fp``."""
    big = f"CAST({scale} AS BIGINT)"
    q = f"""
nodes AS (SELECT src AS host FROM edges UNION SELECT dst AS host FROM edges),
h0 AS (SELECT host, {big} AS hub_fp FROM nodes)
"""
    if iters == 0:
        return q + f"SELECT host, {big} AS hub_fp, {big} AS auth_fp FROM nodes"
    prev = "h0"
    for i in range(1, iters + 1):
        q += f""",
ar{i} AS MATERIALIZED (
  SELECT e.dst AS host, CAST(SUM(p.hub_fp) AS BIGINT) AS a
  FROM edges e JOIN {prev} p ON p.host = e.src GROUP BY 1),
af{i} AS (
  SELECT nodes.host, COALESCE(a, CAST(0 AS BIGINT)) AS a
  FROM nodes LEFT JOIN ar{i} USING (host)),
qa{i} AS (
  SELECT GREATEST(CAST(1 AS BIGINT), CAST(MAX(a) AS BIGINT) // {scale}) AS q
  FROM af{i}),
an{i} AS MATERIALIZED (SELECT host, a // q AS auth_fp FROM af{i} CROSS JOIN qa{i}),
hr{i} AS MATERIALIZED (
  SELECT e.src AS host, CAST(SUM(n.auth_fp) AS BIGINT) AS h
  FROM edges e JOIN an{i} n ON n.host = e.dst GROUP BY 1),
hf{i} AS (
  SELECT nodes.host, COALESCE(h, CAST(0 AS BIGINT)) AS h
  FROM nodes LEFT JOIN hr{i} USING (host)),
qh{i} AS (
  SELECT GREATEST(CAST(1 AS BIGINT), CAST(MAX(h) AS BIGINT) // {scale}) AS q
  FROM hf{i}),
hn{i} AS MATERIALIZED (SELECT host, h // q AS hub_fp FROM hf{i} CROSS JOIN qh{i})
"""
        prev = f"hn{i}"
    return q + (
        f"SELECT h.host, h.hub_fp, a.auth_fp FROM hn{iters} h "
        f"JOIN an{iters} a USING (host)"
    )


def host_hits_sql_duck(
    src: str = "documents", iters: int = HITS_ITERS, scale: int = PR_SCALE
) -> str:
    """DuckDB twin of host_link_edges + hits_scores (relational unroll
    vs the Spark iterative-join loop, same rows bit for bit)."""
    return (
        "WITH "
        + _host_edges_ctes_duck(src)
        + ",\n"
        + hits_unroll_ctes_duck(iters, scale)
    )


def host_link_anchors(
    spark: SparkSession,
    sf_dir: str,
    n_tokens: int = 4,
    id_col: str = "doc_id",
    host_col: str = "source",
) -> DataFrame:
    """Doc-granularity links with anchor text: (src, dst, anchor) — the
    same deterministic hub-skewed destination map as `host_link_edges`,
    but one row per PAGE, carrying the page's first ``n_tokens`` tokens
    as the link's anchor text (the sandbox corpus has no real <a> tags;
    at production scale this relation comes straight from anchor
    extraction)."""
    from linear_quadtree_spark.functions.textexpr import SPARK, tokens_expr

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    hosts = (
        docs.select(F.col(host_col).alias("host"))
        .distinct()
        .select(
            "host",
            (F.row_number().over(Window.orderBy("host")) - 1).alias("idx"),
        )
    )
    n = F.broadcast(hosts.agg(F.count(F.lit(1)).alias("n_hosts")))
    return (
        docs.crossJoin(n)
        .select(
            F.col(host_col).alias("src"),
            F.expr(
                f"((({id_col} * {_EDGE_A} + {_EDGE_C}) % {_EDGE_P} % n_hosts)"
                f" * ((({id_col} * {_EDGE_A} + {_EDGE_C}) % {_EDGE_P}) % n_hosts))"
                " div n_hosts"
            ).alias("_didx"),
            F.expr(
                f"array_join(slice({tokens_expr(SPARK, 'text')}, 1, {n_tokens}), ' ')"
            ).alias("anchor"),
        )
        .join(F.broadcast(hosts), F.col("_didx") == F.col("idx"))
        .filter(F.col("src") != F.col("host"))
        .select("src", F.col("host").alias("dst"), "anchor")
    )


def anchor_terms(
    anchors: DataFrame,
    top_k: int = 3,
    dst_col: str = "dst",
    anchor_col: str = "anchor",
) -> DataFrame:
    """Per-target-host top anchor terms: (dst, token, cnt, rank) — what
    the web calls a page/host ABOUT (anchor text is the classic external
    relevance signal, and at corpus scale the strongest one). Plan: one
    (dst, token) hash aggregate with map-side combine (anchor vocab per
    host is tiny, so the combine collapses almost everything before the
    exchange), then a per-dst window top-k over the already-aggregated
    relation — the window input is vocab-sized, never link-sized."""
    from linear_quadtree_spark.functions.textexpr import SPARK, tokens_expr

    ex = anchors.select(
        F.col(dst_col),
        F.explode(F.expr(tokens_expr(SPARK, anchor_col))).alias("token"),
    )
    agg = ex.groupBy(dst_col, "token").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    w = Window.partitionBy(dst_col).orderBy(F.col("cnt").desc(), F.col("token"))
    return (
        agg.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= top_k)
        .select(dst_col, "token", "cnt", "rank")
    )


def anchor_terms_sql_duck(
    src: str = "documents",
    top_k: int = 3,
    n_tokens: int = 4,
) -> str:
    """DuckDB twin of host_link_anchors + anchor_terms."""
    from linear_quadtree_spark.functions.textexpr import DUCK, tokens_expr

    return f"""
WITH hs AS (SELECT DISTINCT source AS host FROM {src}),
hosts AS (SELECT host, ROW_NUMBER() OVER (ORDER BY host) - 1 AS idx FROM hs),
hn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_hosts FROM hosts),
links AS (
  SELECT d.source AS src, h.host AS dst,
         array_to_string(list_slice({tokens_expr(DUCK, 'd.text')}, 1, {n_tokens}), ' ') AS anchor
  FROM {src} d CROSS JOIN hn
  JOIN hosts h ON (
    (((d.doc_id * {_EDGE_A} + {_EDGE_C}) % {_EDGE_P} % hn.n_hosts)
     * (((d.doc_id * {_EDGE_A} + {_EDGE_C}) % {_EDGE_P}) % hn.n_hosts))
    // hn.n_hosts) = h.idx
  WHERE d.source <> h.host),
ex AS (SELECT dst, unnest({tokens_expr(DUCK, 'anchor')}) AS token FROM links),
agg AS (SELECT dst, token, CAST(COUNT(*) AS BIGINT) AS cnt FROM ex GROUP BY 1, 2),
r AS (SELECT dst, token, cnt,
             ROW_NUMBER() OVER (PARTITION BY dst ORDER BY cnt DESC, token) AS rank
      FROM agg)
SELECT dst, token, cnt, CAST(rank AS INTEGER) AS rank FROM r WHERE rank <= {top_k}
"""
