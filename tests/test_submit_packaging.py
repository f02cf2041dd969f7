"""The spark-submit --py-files ship path must keep working: build the zip,
submit the pipeline job in a fresh process, verify the snapshot commit and
the resume pointer."""

import json
import os
import subprocess
import sys


def test_pyfiles_zip_and_submit(tmp_path):
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run([sys.executable,
                          os.path.join(root, "tools", "make_pyfiles.py")],
                         capture_output=True, text=True, check=True)
    zip_path = out.stdout.strip().splitlines()[-1]
    assert zip_path.endswith("vector_tile_go_spark.zip")
    store = str(tmp_path / "tiles")
    r = subprocess.run(
        ["spark-submit", "--master", "local[4]",
         "--conf", "spark.ui.enabled=false",
         "--py-files", zip_path,
         os.path.join(root, "jobs", "tile_pipeline.py"),
         "/root/testdata/sf0.001", store, "12"],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "SNAPSHOT" in r.stdout
    manifest_files = []
    for dirpath, _, files in os.walk(store):
        manifest_files += [os.path.join(dirpath, f) for f in files
                           if f == "MANIFEST.json"]
    assert manifest_files
    m = json.load(open(manifest_files[0]))
    assert m["total_rows"] == 750
    assert m["partitions"]
