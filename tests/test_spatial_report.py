"""Spatial situation-report job: runs end to end and its sections obey
the structural laws the composing operators guarantee."""

import json
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def test_spatial_report_end_to_end():
    proc = subprocess.run(
        [
            sys.executable,
            str(ROOT / "jobs" / "spatial_report.py"),
            "--sf-dir",
            "/root/testdata/sf0.001",
        ],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=str(ROOT),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    r = json.loads(proc.stdout.strip().splitlines()[-1])

    assert sum(r["build_quadrants"].values()) > 0
    assert len(r["densest_tiles"]) > 0
    assert r["gi_star"]["tiles"] > 0
    assert sum(r["emerging_patterns"].values()) > 0
    # visitor pyramid: per-level totals and tile counts both shrink
    # monotonically toward the root (sketch merge can only lose mass
    # to estimator saturation, never gain)
    levels = sorted(int(k) for k in r["visitor_pyramid"])
    tiles = [r["visitor_pyramid"][str(l)]["tiles"] for l in levels]
    assert tiles == sorted(tiles)
    assert tiles[0] == 1  # level 0 is one root cell
    # geofence flips alternate per user, so enters >= exits >= enters-users
    gf = r["geofence"]
    assert gf["enters"] >= gf["exits"] >= gf["enters"] - gf["users"]
    assert set(r["site_reach"]) == {
        "tokyo", "london", "nyc", "sydney", "saopaulo", "nairobi"
    }
