"""E2E of the north rule's deployment shape: spark-submit --py-files.

Packages the library (tools/make_pyfiles.py), then runs
tools/submit_validate.py under a REAL spark-submit from an EMPTY working
directory — the driver and executors import ndto_spark from the zip, not
from the repo checkout — and exercises the resumable checkpoint loop both
cold (all buckets) and warm (resume is a no-op on a finished run).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit")


def _last_json_line(stdout: str) -> dict:
    for line in reversed(stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise AssertionError(f"no JSON summary in stdout: {stdout[-500:]}")


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_pyfiles_resumable(tmp_path):
    zip_path = (
        subprocess.run(
            [sys.executable, os.path.join(ROOT, "tools", "make_pyfiles.py")],
            capture_output=True, text=True, check=True, cwd=ROOT,
        ).stdout.strip().splitlines()[-1]
    )
    assert zip_path.endswith("ndto_spark.zip") and os.path.exists(zip_path)
    workdir = tmp_path / "empty_cwd"
    workdir.mkdir()
    ck = tmp_path / "ck"
    cmd = [
        SPARK_SUBMIT,
        "--master", "local[4]",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.sql.shuffle.partitions=8",
        "--py-files", zip_path,
        os.path.join(ROOT, "tools", "submit_validate.py"),
        "--synth", "3000", "--checkpoint", str(ck), "--buckets", "4",
    ]
    r1 = subprocess.run(
        cmd, capture_output=True, text=True, cwd=workdir, timeout=300
    )
    assert r1.returncode == 0, r1.stderr[-3000:]
    s1 = _last_json_line(r1.stdout)
    assert s1["finished"] and s1["completed"] == [0, 1, 2, 3]
    assert "duplicate_keys" in s1
    # the ndto:write/2 plan artifact rides the run header
    assert (ck / "plan.json").exists() and (ck / "run.json").exists()
    # warm resume: every bucket already manifested — the second run must
    # recognize the completed state (and not rewrite the plan artifact)
    plan_mtime = os.path.getmtime(ck / "plan.json")
    r2 = subprocess.run(
        cmd, capture_output=True, text=True, cwd=workdir, timeout=300
    )
    assert r2.returncode == 0, r2.stderr[-3000:]
    s2 = _last_json_line(r2.stdout)
    assert s2["finished"] and s2["completed"] == [0, 1, 2, 3]
    assert os.path.getmtime(ck / "plan.json") == plan_mtime
