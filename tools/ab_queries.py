"""A/B a set of registered queries under two env settings, one session each.

Usage:
    python tools/ab_queries.py --env SPARK_GRAFT_SCAN_PARALLELIZE=auto,off \
        [--reps 3] q25_embedding_topk q03_top_orders ...

Spawns one subprocess per env value (fresh JVM + fresh module import, so
plan-build-time env reads are honest), runs each query with the noop sink
(bench methodology, warmup first), prints min-of-reps per query per mode.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {here!r})
from pyspark.sql import SparkSession
cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
b = SparkSession.builder
for kv in os.environ.get("AB_EXTRA_CONF", "").split(";"):
    if "=" in kv:
        k, _, v = kv.partition("=")
        b = b.config(k.strip(), v.strip())
spark = (
    b.master(f"local[{{cpus}}]")
    .appName("ab")
    .config("spark.sql.shuffle.partitions", os.environ.get("AB_SHUFFLE_PARTS", str(cpus)))
    .config("spark.sql.adaptive.enabled", os.environ.get("AB_AQE", "true"))
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as entrymod
qs = {{**entrymod.queries(), **entrymod.extra_queries()}}
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark.read.parquet(f"{{sf_dir}}/region.parquet").count()
from pyspark.sql.functions import col, pandas_udf
@pandas_udf("double")
def _warm(x):
    return x.astype("float64")
spark.range(0, 32_000, 1, int(cpus)).select(_warm(col("id"))).write.format(
    "noop").mode("overwrite").save()
names = json.loads(sys.argv[1]); reps = int(sys.argv[2])
out = {{}}
for _ in range(reps):
    for n in names:
        t0 = time.perf_counter()
        qs[n](spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        if n not in out or dt < out[n]:
            out[n] = dt
print("ABRESULT " + json.dumps(out))
spark.stop()
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--env", required=True,
                    help="VAR=val1,val2 — one child run per value ('unset' = absent)")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("queries", nargs="+")
    ns = ap.parse_args()
    var, _, vals = ns.env.partition("=")
    results = {}
    for val in vals.split(","):
        env = dict(os.environ)
        env["PYTHONPATH"] = HERE
        if val == "unset":
            env.pop(var, None)
        else:
            env[var] = val
        r = subprocess.run(
            [sys.executable, "-c", _CHILD.format(here=HERE),
             json.dumps(ns.queries), str(ns.reps)],
            env=env, capture_output=True, text=True, check=False)
        line = next((l for l in r.stdout.splitlines()
                     if l.startswith("ABRESULT ")), None)
        if line is None:
            print(f"mode {var}={val} FAILED:\n{r.stdout[-2000:]}\n{r.stderr[-2000:]}")
            continue
        results[val] = json.loads(line[len("ABRESULT "):])
    names = ns.queries
    modes = list(results)
    print(f"{'query':32s} " + " ".join(f"{var}={m:>10s}" for m in modes))
    for n in names:
        row = " ".join(f"{results[m].get(n, float('nan')):>{11+len(var)}.2f}"
                       for m in modes)
        print(f"{n:32s} {row}")
    for m in modes:
        print(f"total {var}={m}: {sum(results[m].values()):.2f}")


if __name__ == "__main__":
    main()
