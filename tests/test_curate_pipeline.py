"""End-to-end curation pipeline job: the funnel is monotone, the
output parquet matches the final stage, and a re-run resumes from the
stage markers without recomputing (and reports identical numbers)."""

import json
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def _run(out_dir: str) -> dict:
    proc = subprocess.run(
        [
            sys.executable,
            str(ROOT / "jobs" / "curate_pipeline.py"),
            "--sf-dir",
            "/root/testdata/sf0.001",
            "--out",
            out_dir,
        ],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=str(ROOT),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    return json.loads(proc.stdout.strip().splitlines()[-1])


def test_pipeline_funnel_and_resume(tmp_path):
    out = str(tmp_path / "curated")
    m = _run(out)
    s = m["stages"]
    chain = [
        m["docs_in"],
        s["membership"],
        s["neardup_canonical"],
        s["decontaminated"],
        s["lm_passed"],
    ]
    assert all(a >= b for a, b in zip(chain, chain[1:])), chain
    assert m["docs_out"] == s["lm_passed"] > 0
    assert m["curated_tokens"] > 0 and m["packed_sequences"] > 0

    # resume: identical metrics, strictly less work (stage markers hit)
    m2 = _run(out)
    assert {k: v for k, v in m2.items() if k != "wall_s"} == {
        k: v for k, v in m.items() if k != "wall_s"
    }
