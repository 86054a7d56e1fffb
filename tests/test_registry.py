"""Structural invariants of the __spark_entry__ registry — the driver
contract: every query is oracle-paired and family-tagged, names are
well-formed, and the evidence-rotation window actually front-loads
never-driver-checked queries (round-5 rotation)."""

import json
import re
from pathlib import Path

import __spark_entry__ as entrymod

REPO = Path(__file__).resolve().parent.parent


def test_every_query_is_oracle_paired_and_tagged():
    qs = entrymod._RAW_QUERIES
    oracles = entrymod.oracle_sql()
    fams = entrymod.query_families()
    assert set(oracles) <= set(qs), "oracle for a non-existent query"
    # full pairing: non-SQL-expressible ops would be the documented
    # exception; currently there are none, keep it that way knowingly
    assert set(oracles) == set(qs)
    assert set(fams) == set(qs)
    assert all(re.fullmatch(r"[a-z0-9_]+", k) for k in qs)
    assert all(re.fullmatch(r"[a-z0-9_]+", f) for f in fams.values())


def test_oracle_sql_is_nonempty_select():
    for name, sql in entrymod.oracle_sql().items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name


def test_rotation_front_loads_unchecked_queries():
    """First 50 registry keys must contain >= 40 queries with no prior
    driver CORRECTNESS row (the round-4 verdict's acceptance bar for
    the evidence rotation)."""
    checked = set()
    for p in sorted(REPO.glob("CORRECTNESS_r0[234].json")):
        checked |= set(json.loads(p.read_text()))
    if not checked:  # fresh clone without driver records
        return
    window = list(entrymod._RAW_QUERIES)[:50]
    fresh = [k for k in window if k not in checked]
    assert len(fresh) >= 40, f"only {len(fresh)} never-checked in window"


def test_families_cover_the_advertised_taxonomy():
    fams = set(entrymod.query_families().values())
    for expected in (
        "core", "tiles", "spatial_stats", "spacetime", "altindex",
        "dedup", "ann", "text", "crawl", "graph", "media", "tokenizer",
    ):
        assert expected in fams, expected
