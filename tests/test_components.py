"""Connected components + dedup-group resolution vs a Python
union-find ground truth, including adversarial graph shapes the
pointer-jumping bound exists for (long chains)."""

import random

import pytest

from linear_quadtree_spark.operators.components import (
    connected_components,
    dedup_groups,
)


def _union_find(n_ids, pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in n_ids}


def _cc(spark, pairs, **kw):
    df = spark.createDataFrame(pairs, "id_a: long, id_b: long")
    return {r.id: r.comp for r in connected_components(df, **kw).collect()}


def test_basic_shapes(spark):
    # triangle {1,2,3}, edge {10,11}, chain {20..24}, self-dup pair (30,30)
    pairs = [(1, 2), (2, 3), (1, 3), (10, 11), (20, 21), (21, 22),
             (22, 23), (23, 24), (30, 30)]
    got = _cc(spark, pairs)
    ids = sorted({i for p in pairs for i in p})
    assert got == _union_find(ids, pairs)


def test_long_chain_converges_in_log_rounds(spark):
    # a 256-node path: naive min-propagation needs ~256 rounds; pointer
    # jumping must collapse it within the 12-round budget (>2x doubling)
    pairs = [(i, i + 1) for i in range(255)]
    got = _cc(spark, pairs, max_rounds=12)
    assert set(got.values()) == {0}
    assert len(got) == 256


def test_random_graph_matches_union_find(spark):
    rng = random.Random(7)
    ids = list(range(300))
    pairs = [(rng.choice(ids), rng.choice(ids)) for _ in range(200)]
    got = _cc(spark, pairs)
    exp = _union_find(sorted({i for p in pairs for i in p}), pairs)
    assert got == exp


def test_max_rounds_guard(spark):
    pairs = [(i, i + 1) for i in range(63)]
    df = spark.createDataFrame(pairs, "id_a: long, id_b: long")
    with pytest.raises(RuntimeError):
        connected_components(df, max_rounds=1)


def test_dedup_groups_covers_unpaired_docs(spark):
    docs = spark.createDataFrame([(i,) for i in range(10)], "doc_id: long")
    pairs = spark.createDataFrame([(1, 4), (4, 7), (2, 3)], "id_a: long, id_b: long")
    rows = {r.doc_id: (r.group_id, r.is_canonical)
            for r in dedup_groups(docs, pairs).collect()}
    assert rows[1] == (1, 1) and rows[4] == (1, 0) and rows[7] == (1, 0)
    assert rows[2] == (2, 1) and rows[3] == (2, 0)
    # unpaired docs are their own canonical group
    for i in (0, 5, 6, 8, 9):
        assert rows[i] == (i, 1)
    # exactly one canonical doc per group
    assert sum(c for _, c in rows.values()) == len({g for g, _ in rows.values()})
