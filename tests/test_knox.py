"""knox_test vs a pure-Python brute-force pair scan over the event
geotags — counts exact, E/z to 1e-12."""

import datetime as dt
import math
import random

from pyspark.sql import functions as F

from linear_quadtree_spark.functions.geotag import geotag_x_sql, geotag_y_sql
from linear_quadtree_spark.operators.spacetime import knox_test

T0 = dt.datetime(2026, 1, 1, 12, 0, 0)


def test_knox_matches_bruteforce(spark):
    rng = random.Random(7)
    evs = [(i, rng.randrange(0, 10 * 86400)) for i in range(400)]
    df = spark.createDataFrame(
        [(e, T0 + dt.timedelta(seconds=s)) for e, s in evs],
        "event_id: long, ts: timestamp",
    )
    coords = {
        r.event_id: (r.x, r.y)
        for r in spark.createDataFrame(
            [(e,) for e, _ in evs], "event_id: long"
        ).select(
            "event_id",
            F.expr(f"CAST({geotag_x_sql('event_id')} AS DOUBLE)").alias("x"),
            F.expr(f"CAST({geotag_y_sql('event_id')} AS DOUBLE)").alias("y"),
        ).collect()
    }
    r_sp, tau = 8.0, 86400
    eps = [(e, s + int(T0.replace(tzinfo=dt.timezone.utc).timestamp()))
           for e, s in evs]
    ns = nt = x = 0
    for i, (e1, t1) in enumerate(eps):
        for e2, t2 in eps[i + 1:]:
            (x1, y1), (x2, y2) = coords[e1], coords[e2]
            sc = (x1 - x2) ** 2 + (y1 - y2) ** 2 <= r_sp * r_sp
            tc = abs(t1 - t2) <= tau
            ns += sc
            nt += tc
            x += sc and tc
    row = knox_test(df, r=r_sp, dt_s=tau).collect()[0]
    n = len(evs)
    assert row.n_events == n
    assert row.npairs == n * (n - 1) // 2
    assert (row.pairs_space, row.pairs_time, row.pairs_both) == (ns, nt, x)
    e = ns * nt / row.npairs
    assert abs(row.knox_e - e) <= 1e-12 * max(1.0, e)
    z = (x - e) / math.sqrt(e)
    assert abs(row.knox_z - z) <= 1e-9 * max(1.0, abs(z))


def test_knox_validation(spark):
    import pytest

    df = spark.createDataFrame([(1, T0)], "event_id: long, ts: timestamp")
    with pytest.raises(ValueError):
        knox_test(df, r=0.0, dt_s=10)
    with pytest.raises(ValueError):
        knox_test(df, r=1.0, dt_s=0)
