"""fetch_schedule: politeness invariant, deterministic total order,
capacity fallbacks, lockstep with the DuckDB twin, and the
one-shuffle + broadcast plan shape."""

import duckdb

from linear_quadtree_spark.operators.frontier import (
    fetch_schedule,
    fetch_schedule_sql_duck,
)

FRONTIER = [
    ("h1", f"https://h1/{i}", (i * 7) % 5) for i in range(9)
] + [
    ("h2", f"https://h2/{i}", 3) for i in range(4)  # all-tie priorities
] + [
    ("h3", "https://h3/only", 0),
]
SLOTS = [("h1", 3), ("h3", 2)]  # h2 missing -> default cap


def _dfs(spark):
    f = spark.createDataFrame(FRONTIER, "host: string, url: string, priority: long")
    s = spark.createDataFrame(SLOTS, "host: string, cap: long")
    return f, s


def test_politeness_invariant(spark):
    f, s = _dfs(spark)
    rows = fetch_schedule(f, s, default_slots=2).collect()
    per_wave = {}
    for r in rows:
        per_wave.setdefault((r.host, r.wave), []).append(r.slot)
        cap = dict(SLOTS).get(r.host, 2)
        assert r.cap == cap
        assert 0 <= r.slot < cap
    for (host, _), slots in per_wave.items():
        cap = dict(SLOTS).get(host, 2)
        assert len(slots) <= cap
        assert len(set(slots)) == len(slots)  # distinct slots in a wave


def test_priority_order_and_determinism(spark):
    f, s = _dfs(spark)
    for _ in range(2):
        rows = sorted(
            (r.url, r.wave, r.slot)
            for r in fetch_schedule(f, s).collect()
            if r.host == "h2"
        )
        # all-tie priorities: url ASC decides, stable across runs
        assert rows == [
            ("https://h2/0", 0, 0),
            ("https://h2/1", 1, 0),
            ("https://h2/2", 2, 0),
            ("https://h2/3", 3, 0),
        ]
    # within h1, a higher-priority url never fetches in a later wave
    by_url = {
        r.url: r for r in fetch_schedule(f, s).collect() if r.host == "h1"
    }
    rs = sorted(by_url.values(), key=lambda r: (-r.priority, r.url))
    waves = [r.wave for r in rs]
    assert waves == sorted(waves)


def test_duckdb_lockstep(spark):
    f, s = _dfs(spark)
    got = sorted(
        (r.host, r.url, r.priority, r.cap, r.wave, r.slot)
        for r in fetch_schedule(f, s, default_slots=2).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE f(host VARCHAR, url VARCHAR, priority BIGINT)")
    con.executemany("INSERT INTO f VALUES (?,?,?)", FRONTIER)
    con.execute("CREATE TABLE s(host VARCHAR, cap BIGINT)")
    con.executemany("INSERT INTO s VALUES (?,?)", SLOTS)
    exp = sorted(
        (r[0], r[1], r[2], r[3], r[4], r[5])
        for r in con.execute(
            fetch_schedule_sql_duck("f", "s", default_slots=2)
        ).fetchall()
    )
    assert got == exp


def test_plan_one_shuffle_broadcast_dim(spark):
    f, s = _dfs(spark)
    plan = (
        fetch_schedule(f, s)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert plan.count("Exchange hashpartitioning") == 1
