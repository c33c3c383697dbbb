"""The north rule's deployment shape, executed for real: package the
engine as a zip, run it via ``spark-submit --py-files`` from a directory
where the package is NOT otherwise importable, drain a changelog
end-to-end, and check the final table against the sequential oracle —
proving a stock Spark distribution needs nothing but the zip and the
entry script (reference analogue: the single server binary plus config,
server/main/main.go)."""

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _build_zip(zpath: str) -> None:
    # exactly the README recipe: zip -r milvus_cdc_spark.zip milvus_cdc_spark
    pkg_root = os.path.join(REPO, "milvus_cdc_spark")
    with zipfile.ZipFile(zpath, "w") as z:
        for dirpath, _dirs, files in os.walk(pkg_root):
            if "__pycache__" in dirpath:
                continue
            for fn in files:
                if fn.endswith(".pyc"):
                    continue
                full = os.path.join(dirpath, fn)
                z.write(full, os.path.relpath(full, REPO))


def test_spark_submit_py_files_drain(spark, tmp_path):
    submit = shutil.which("spark-submit")
    if submit is None:
        pytest.skip("no spark-submit on PATH")

    from milvus_cdc_spark.oracle import replay
    from milvus_cdc_spark.plans.manifest import SnapshotTable
    from milvus_cdc_spark.sources import generate_changelog, write_changelog

    log_df = generate_changelog(
        spark, 800, n_parts=4, n_convs=12, turns_per_conv=5
    )
    rows = [r.asDict() for r in log_df.collect()]
    log_dir = str(tmp_path / "log")
    write_changelog(log_df, log_dir, n_files=4)

    zpath = str(tmp_path / "milvus_cdc_spark.zip")
    _build_zip(zpath)

    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    # PYTHONPATH stripped + cwd outside the repo: the package can reach
    # the driver and executors ONLY through --py-files
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["SPARK_GRAFT_CPUS"] = "2"
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    r = subprocess.run(
        [
            submit, "--master", "local[2]", "--py-files", zpath,
            os.path.join(REPO, "scripts", "submit_drain.py"),
            "drain", "--log", log_dir, "--table", table,
            "--checkpoint", ckpt, "--master", "local[2]",
        ],
        capture_output=True, text=True, env=env, timeout=600,
        cwd=str(tmp_path),
    )
    assert r.returncode == 0, f"stdout:\n{r.stdout[-2000:]}\nstderr:\n{r.stderr[-3000:]}"
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["drained"] and out["epochs_committed"] >= 1, out

    got = {
        (x["conv_id"], x["turn_idx"]): x["text"]
        for x in SnapshotTable(table).read(spark).collect()
    }
    want = {
        (x["conv_id"], x["turn_idx"]): x["text"] for x in replay(rows)[0]
    }
    assert got == want
