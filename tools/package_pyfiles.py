"""Package the engine for `spark-submit --py-files` (BASELINE.json
north_rule: "run via spark-submit --py-files on a multi-executor cluster").

Produces `dist/graphanalytics_spark.zip` containing the package (no tests,
no bytecode). Submit like:

    spark-submit --master <cluster> \
        --py-files dist/graphanalytics_spark.zip \
        your_job.py

`tools/submit_smoke_job.py` is a minimal job for verifying the artifact;
`tests/test_submit.py` runs it through a real local spark-submit.

Usage: python tools/package_pyfiles.py [out_zip]
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_zip: str | None = None) -> str:
    out_zip = out_zip or os.path.join(REPO, "dist", "graphanalytics_spark.zip")
    os.makedirs(os.path.dirname(out_zip), exist_ok=True)
    pkg = os.path.join(REPO, "graphanalytics_spark")
    with zipfile.ZipFile(out_zip, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if f.endswith(".pyc"):
                    continue
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))
    return out_zip


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else None))
