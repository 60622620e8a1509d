#!/usr/bin/env python
"""Ad-hoc measurement harness for the optimization round (guide §1).

NOT the driver contract — bench.py is frozen for measurement. This file
exists to (a) time individual queries in isolation with the noop sink,
(b) dump .explain("formatted") plans to plans/<tag>/<query>_<suffix>.txt,
(c) attach job descriptions so the timeline is readable.

Usage:
  python bench_extra.py [--sf DIR] [--reps N] [--plans TAG --suffix before]
                        [query ...]

Prints one JSON line: {"queries": {name: [rep_secs...]}, "sf": ..., ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("PYSPARK_PYTHON", sys.executable)
os.environ.setdefault("PYSPARK_DRIVER_PYTHON", sys.executable)

REPO = os.path.dirname(os.path.abspath(__file__))


def main() -> None:
    args = sys.argv[1:]

    def opt(name, default=None):
        if name in args:
            i = args.index(name)
            v = args[i + 1]
            del args[i:i + 2]
            return v
        return default

    sf_dir = opt("--sf", os.environ.get("SPARK_GRAFT_SF_DIR",
                                        "/root/testdata/sf0.1"))
    reps = int(opt("--reps", "1"))
    plans_tag = opt("--plans")
    suffix = opt("--suffix", "before")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("minhashsketch-bench-extra")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "48g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # same untimed warmup as bench.py so query 1 isn't charged session startup
    import bench as bench_mod

    bench_mod._warmup(spark)

    qs = entry_mod.queries()
    names = args or list(qs)
    out: dict[str, list[float]] = {}
    loads: dict[str, list[float]] = {}
    for name in names:
        out[name] = []
        loads[name] = []
        for r in range(reps):
            with open("/proc/loadavg") as f:
                loads[name].append(float(f.read().split()[0]))
            spark.sparkContext.setJobDescription(f"{name} rep{r}")
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            out[name].append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            time.sleep(1.0)
        if plans_tag:
            pdir = os.path.join(REPO, "plans", plans_tag)
            os.makedirs(pdir, exist_ok=True)
            df = qs[name](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted"))
            with open(os.path.join(pdir, f"{name}_{suffix}.txt"), "w") as f:
                f.write(plan)
        print(json.dumps({name: out[name], "load1": loads[name]}),
              file=sys.stderr, flush=True)
    print(json.dumps({"queries": out, "loadavg1": loads, "sf": sf_dir,
                      "cpus": int(cpus), "reps": reps}))
    spark.stop()


if __name__ == "__main__":
    main()
