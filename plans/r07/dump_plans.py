#!/usr/bin/env python
"""Dump .explain("formatted") for every headline query to <outdir>/<name><suffix>.txt.
Run from a repo root (round-start worktree for _before, working tree for _after):
  python plans/r07/dump_plans.py <outdir> <suffix> [sf_dir]
"""
import os
import sys

sys.path.insert(0, os.getcwd())

outdir, suffix = sys.argv[1], sys.argv[2]
sf = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

from distributed_crawler_spark.plans import registry  # noqa: E402
from distributed_crawler_spark.session import get_spark  # noqa: E402

import bench  # noqa: E402  (the same repo root's frozen HEADLINE list)

names = [n for n in bench.HEADLINE if n in registry.QUERIES]

spark = get_spark(cores=32, app_name="plan-dump")
os.makedirs(outdir, exist_ok=True)
for name in names:
    try:
        df = registry.QUERIES[name](spark, sf)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
    except Exception as e:  # a query that fails to build still gets a record
        txt = f"PLAN DUMP FAILED: {e}\n"
    with open(os.path.join(outdir, f"{name}{suffix}.txt"), "w") as f:
        f.write(txt)
    print("dumped", name, flush=True)
print("DONE", len(names))
