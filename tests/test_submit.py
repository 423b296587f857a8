"""spark-submit --py-files packaging gate (BASELINE.json north_rule): the
zipped engine must be importable and functional in a fresh spark-submit
process whose CWD is NOT the repo (so only --py-files provides the code)."""

import json
import subprocess
import sys
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_pyfiles(tmp_path):
    sys.path.insert(0, REPO)
    from tools.package_pyfiles import build

    zip_path = build(str(tmp_path / "ga.zip"))
    job = os.path.join(REPO, "tools", "submit_smoke_job.py")
    env = dict(os.environ, PYTHONPATH="")  # repo must NOT leak in
    out = subprocess.run(
        [
            "/opt/spark/bin/spark-submit",
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            job,
        ],
        capture_output=True, text=True, timeout=420, cwd=str(tmp_path), env=env,
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("SMOKE_RESULT")]
    assert lines, f"no result; stderr tail: {out.stderr[-2000:]}"
    res = json.loads(lines[0].split(" ", 1)[1])
    assert res["rank_sum"] == 1.0
    assert res["n_components"] == 2
