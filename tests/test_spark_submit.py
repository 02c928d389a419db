"""North-rule clause: "runs via spark-submit --py-files".

This test actually does it: zips the package, copies cli.py out, and
submits from a CLEAN working directory (the repo is not on sys.path, so
every import must resolve from the --py-files zip — the exact cluster
deployment path).
"""

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit")


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="no spark-submit on PATH")
def test_flagship_runs_from_py_files_zip(tmp_path):
    pkg = os.path.join(REPO, "ndjson_spatial_spark")
    zip_path = tmp_path / "engine.zip"
    with zipfile.ZipFile(zip_path, "w") as zf:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                zf.write(full, os.path.relpath(full, REPO))
    driver = tmp_path / "cli.py"
    shutil.copy(os.path.join(pkg, "cli.py"), driver)

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    out = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--py-files", str(zip_path), str(driver),
         "--job", "flagship", "--docs", "1500"],
        capture_output=True, text=True, timeout=420, cwd=str(tmp_path),
        env=env,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    result = None
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{") and '"job"' in line:
            result = json.loads(line)
    assert result is not None, out.stdout[-2000:]
    assert result["rows"] > 0
