"""north_star packaging claim, literally: `spark-submit --py-files` with the
package ZIPPED (no install, no PYTHONPATH) must build an index and serve a
query — the cluster submission path, not the library import path."""

import json
import os
import shutil
import subprocess
import zipfile

from luceneindexer_spark.corpus import HOT_TERM, synth_corpus

SPARK_SUBMIT = "/opt/spark/bin/spark-submit"


def test_spark_submit_py_files_build_and_query(spark, tmp_path):
    corpus_dir = str(tmp_path / "corpus")
    synth_corpus(spark, 120, partitions=2).write.parquet(corpus_dir)
    idx = str(tmp_path / "idx")

    pkg_zip = str(tmp_path / "li_spark.zip")
    src_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with zipfile.ZipFile(pkg_zip, "w") as z:
        for dirpath, _dirs, files in os.walk(
                os.path.join(src_root, "luceneindexer_spark")):
            if "__pycache__" in dirpath:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, src_root))
    launcher = os.path.join(src_root, "submit_cli.py")

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}

    def submit(*argv):
        r = subprocess.run(
            [SPARK_SUBMIT, "--master", "local[2]",
             "--conf", "spark.sql.shuffle.partitions=2",
             "--conf", "spark.ui.enabled=false",
             "--py-files", pkg_zip, launcher, *argv],
            capture_output=True, text=True, env=env, timeout=420)
        assert r.returncode == 0, r.stderr[-3000:]
        return [json.loads(line) for line in r.stdout.splitlines()
                if line.startswith("{")]

    rep = submit("build", "--input", corpus_dir, "--out", idx,
                 "--range-size", "64", "--buckets", "4")
    assert rep[-1]["n_docs"] == 120

    hits = submit("query", "--index", idx, HOT_TERM, "-k", "5")
    assert 0 < len(hits) <= 5 and "doc_id" in hits[0]
    shutil.rmtree(idx, ignore_errors=True)
