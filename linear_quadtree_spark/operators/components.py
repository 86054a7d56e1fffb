"""Connected components over a pair relation, and dedup-group
resolution on top of it — the step between "near-dup PAIRS" and an
actual deduplicated corpus: transitive near-duplicates form one group,
one canonical document per group survives.

The reference repo has no graph operators (its queries stop at key
range scans, SURVEY §2.9); this is payload-side infrastructure the
north rule's 10^12-page table needs: MinHash/SimHash emit pairs, but
dropping duplicates requires the transitive closure (A~B, B~C must
collapse A,B,C together even when A~C was never emitted).

Scale shape
-----------
Min-label propagation with POINTER JUMPING, all DataFrame ops:

    round:  neighbor-min   (edges ⋈ labels on src, min per node)
            pointer jump   (labels ⋈ labels on lbl=id — path halving)

Neighbor-min alone needs O(diameter) rounds; the jump step shortcuts
label chains so chains of length L collapse in O(log L) rounds (each
round more than doubles the propagation horizon). Near-dup clusters
are clique-ish (every member shares most shingles), so diameter is
tiny in practice; the jump bound is the adversarial guard (e.g. a
chain of drifting revisions). Every round is a bounded shuffle on the
node id; `localCheckpoint` truncates the per-round lineage so plans
stay O(1) deep (on a real cluster, set a reliable checkpoint dir and
use `checkpoint` — localCheckpoint trades executor-loss recovery for
speed, the right default on local[k]).

Convergence is detected with one cheap action per round: labels only
ever decrease, so `sum(lbl)` strictly decreases until the fixpoint and
equality means converged. The driver holds ONE number — no label data
ever leaves the cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "connected_components",
    "dedup_groups",
    "components_ctes_duck",
    "dedup_groups_sql_duck",
]


def connected_components(
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_rounds: int = 50,
) -> DataFrame:
    """(id, comp) for every node appearing in `pairs`; comp = the
    minimum node id reachable through the pair graph (the canonical
    component label). Nodes with no pairs simply don't appear — callers
    left-join and coalesce (see dedup_groups).

    max_rounds is an adversarial guard: with pointer jumping even a
    pure path graph of 2^max_rounds nodes converges; hitting the cap
    raises rather than returning partial labels."""
    e = pairs.select(
        F.col(a_col).cast("long").alias("src"), F.col(b_col).cast("long").alias("dst")
    )
    edges = (
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("src").alias("id")).distinct().withColumn("lbl", F.col("id"))
    )
    prev_sum = None
    for _ in range(max_rounds):
        nb = edges.join(labels.withColumnRenamed("id", "src"), "src").select(
            F.col("dst").alias("id"), "lbl"
        )
        stepped = labels.union(nb).groupBy("id").agg(F.min("lbl").alias("lbl"))
        # pointer jump: follow each label to ITS label. Every lbl value
        # is a node id (induction from lbl=id at init), so the inner
        # join is total and unique.
        parent = stepped.select(F.col("id").alias("p_id"), F.col("lbl").alias("p_lbl"))
        jumped = stepped.join(parent, stepped["lbl"] == parent["p_id"]).select(
            "id", F.col("p_lbl").alias("lbl")
        )
        # EAGER checkpoint, measured: the lazy variant (eager=False,
        # letting the convergence aggregate materialize) reads ~25%
        # SLOWER here — the agg job then carries the full lineage plus
        # the block write, and loses to the dedicated materialization
        labels = jumped.localCheckpoint()
        s = labels.agg(F.sum("lbl")).first()[0]
        if s == prev_sum:
            break
        prev_sum = s
    else:
        raise RuntimeError(f"connected_components: no fixpoint in {max_rounds} rounds")
    return labels.select("id", F.col("lbl").alias("comp"))


def dedup_groups(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Resolve near-dup pairs into dedup groups over the full corpus:
    (id_col, group_id, is_canonical) for EVERY document — group_id is
    the smallest doc id in the document's transitive near-dup cluster
    (own id when unpaired), is_canonical = 1 for the one kept doc per
    group. `docs.filter(is_canonical = 1)` IS the deduplicated corpus.

    Plan: components over the (tiny relative to corpus) pair relation,
    then ONE left join back to the corpus — the join key is the doc id,
    so at 100 TB this co-partitions with the corpus's natural layout and
    the component side is orders of magnitude smaller (only paired docs)."""
    comp = connected_components(pairs)
    out = (
        docs.select(id_col)
        .join(comp.withColumnRenamed("id", id_col), id_col, "left")
        .withColumn("group_id", F.coalesce(F.col("comp"), F.col(id_col)))
        .withColumn(
            "is_canonical",
            (F.col("group_id") == F.col(id_col)).cast("int"),
        )
    )
    return out.select(id_col, "group_id", "is_canonical")


def components_ctes_duck(
    pairs_cte: str,
    a_col: str = "id_a",
    b_col: str = "id_b",
) -> str:
    """DuckDB CTE chain computing comp(id, comp) from a pair CTE by the
    DEFINITION — recursive transitive closure, min reachable id — so
    the oracle shares no algorithmic structure with the Spark pointer
    jumping. Embed under a `WITH RECURSIVE` opener."""
    return f"""edges AS (
  SELECT {a_col} AS src, {b_col} AS dst FROM {pairs_cte}
  UNION
  SELECT {b_col}, {a_col} FROM {pairs_cte}),
reach(id, lbl) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.src, r.lbl FROM edges e JOIN reach r ON r.id = e.dst),
comp AS (SELECT id, MIN(lbl) AS comp FROM reach GROUP BY id)"""


def dedup_groups_sql_duck(
    docs_src: str,
    pairs_cte: str,
    id_col: str = "doc_id",
) -> str:
    """Final SELECT over components_ctes_duck — lockstep with
    dedup_groups's output columns."""
    return f"""
SELECT d.{id_col},
       COALESCE(c.comp, d.{id_col}) AS group_id,
       CAST(COALESCE(c.comp, d.{id_col}) = d.{id_col} AS INTEGER) AS is_canonical
FROM {docs_src} d LEFT JOIN comp c ON c.id = d.{id_col}"""
