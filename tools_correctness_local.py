#!/usr/bin/env python
"""Serialize the in-repo all-queries oracle comparison (the same check
``tests/test_entry_oracle.py`` runs) to CORRECTNESS_local_r<N>.json —
VERDICT r5 #1: every ``queries()`` entry must carry a green row in a
committed per-round artifact even when the driver's own artifact covers a
subset. Usage: python tools_correctness_local.py [round_number]"""

from __future__ import annotations

import json
import math
import os
import sys
import time

os.environ.setdefault("PYSPARK_PYTHON", sys.executable)
os.environ.setdefault("PYSPARK_DRIVER_PYTHON", sys.executable)

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 9)
                if math.isnan(v):
                    v = "NaN"
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=repr)
    return out


def main() -> None:
    rnd = sys.argv[1] if len(sys.argv) > 1 else "06"
    import duckdb

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod

    spark = (SparkSession.builder.master("local[32]")
             .appName("correctness-local")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "48g")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    oracles = entry_mod.oracle_sql()
    results: dict[str, dict] = {}
    for name, q in entry_mod.queries().items():
        t0 = time.time()
        rec: dict = {"err": None}
        try:
            sdf = q(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            rec["spark_rows"] = len(srows)
            if name in oracles:
                ores = con.execute(oracles[name]).fetchall()
                ocols = [d[0] for d in con.description]
                rec["oracle_rows"] = len(ores)
                rec["schema_match"] = sorted(scols) == sorted(ocols)
                rec["rows_match"] = len(srows) == len(ores)
                rec["hash_match"] = (_norm(srows, scols) == _norm(ores, ocols))
            else:
                rec["oracle_rows"] = None
                rec["schema_match"] = rec["rows_match"] = rec["hash_match"] = None
                rec["rows_only"] = True
        except Exception as e:  # record, keep going — the artifact must cover all
            rec["err"] = f"{type(e).__name__}: {e}"[:500]
        rec["secs"] = round(time.time() - t0, 2)
        results[name] = rec
        ok = rec["err"] is None and rec.get("hash_match") in (True, None)
        print(f"{name}: {'OK' if ok else 'FAIL'} ({rec['secs']}s)",
              file=sys.stderr, flush=True)
        spark.catalog.clearCache()

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       f"CORRECTNESS_local_r{rnd}.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
        f.write("\n")
    n_ok = sum(1 for r in results.values()
               if r["err"] is None and r.get("hash_match") in (True, None))
    print(json.dumps({"artifact": out, "queries": len(results), "ok": n_ok}))
    spark.stop()
    if n_ok != len(results):
        sys.exit(1)


if __name__ == "__main__":
    main()
