"""north_rule end-to-end: the engine runs via ``spark-submit --py-files
pkg.zip`` with NO repo on sys.path — executors and driver import the
package from the shipped archive alone (the deployment mode a real
multi-executor cluster uses)."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_JOB = '''
import json, shutil, sys
from pyspark.sql import SparkSession
from distributed_crawler_spark.config import CrawlConfig
from distributed_crawler_spark.operators.scheduler import CrawlScheduler

corpus, state = sys.argv[1], sys.argv[2]
spark = SparkSession.builder.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
shutil.rmtree(state, ignore_errors=True)
s = CrawlScheduler(
    spark,
    spark.read.parquet(f"{corpus}/pages.parquet"),
    spark.read.parquet(f"{corpus}/robots.parquet"),
    state,
    CrawlConfig(max_depth=1, max_urls_per_domain=5),
)
out = s.run(seeds=spark.read.parquet(f"{corpus}/seeds.parquet"))
print("SUBMIT_RESULT " + json.dumps(out))
'''


def _spark_submit() -> str:
    import pyspark

    cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    return cand if os.path.exists(cand) else "spark-submit"


def test_spark_submit_py_files_runs_a_crawl(corpus_dir):
    staging = tempfile.mkdtemp()
    shutil.copytree(
        os.path.join(REPO, "distributed_crawler_spark"),
        os.path.join(staging, "distributed_crawler_spark"),
        ignore=shutil.ignore_patterns("__pycache__"),
    )
    zip_base = os.path.join(staging, "pkg")
    shutil.make_archive(zip_base, "zip", staging)
    job = os.path.join(staging, "job.py")
    with open(job, "w") as f:
        f.write(_JOB)

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the ONLY package source
    out = subprocess.run(
        [
            _spark_submit(),
            "--master", "local[4]",
            "--py-files", zip_base + ".zip",
            job, corpus_dir, os.path.join(staging, "state"),
        ],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=staging,  # not the repo — imports must come from the zip
        env=env,
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("SUBMIT_RESULT ")]
    assert lines, out.stdout[-2000:] + out.stderr[-2000:]
    summary = json.loads(lines[-1].removeprefix("SUBMIT_RESULT "))
    assert summary["total_scheduled"] > 0
    assert summary["by_status"].get("completed", 0) > 0
    shutil.rmtree(staging, ignore_errors=True)
