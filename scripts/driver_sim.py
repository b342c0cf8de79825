"""Full driver simulation — every registered key on a PLAIN session.

scripts/check_oracle.py is the dev harness: it builds the session via
piper_spark.session.get_spark (UTC pinned, AQE, 32 shuffle
partitions). The DRIVER does none of that — it imports
__spark_entry__.py from its file path, builds its own SparkSession
(default 200 shuffle partitions, host-default timezone), and runs the
queries()/oracle_sql() contract. A key that only passes on the tuned
session is a latent CORRECTNESS_r{N} failure the dev harness cannot
see, so this script sweeps the FULL registry the driver's way:

- importlib-load __spark_entry__.py (not the piper_spark import path);
- a bare SparkSession.builder.master("local[8]") — no UTC conf, no
  shuffle-partition tuning, Arrow left at defaults;
- every queries() key executed; every oracle_sql() key compared
  against DuckDB with check_oracle's exact comparator.

Usage: python scripts/driver_sim.py [sf_dir]      (default sf0.01)
Exit 1 on any failure. ~15 min at sf0.01 on local[8].
"""

from __future__ import annotations

import importlib.util
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.check_oracle import compare, duck_connection  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "spark_entry", os.path.join(repo, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    rows = mod.entry(spark).collect()
    print(f"entry: {len(rows)} rows")
    assert len(rows) == 6, "flagship query must return the 6 TPC-H Q1 groups"

    queries, oracles = mod.queries(), mod.oracle_sql()
    con = duck_connection(sf_dir)
    failed: list[str] = []
    for name in sorted(queries):
        t0 = time.perf_counter()
        try:
            sdf = queries[name](spark, sf_dir).toPandas()
            if name in oracles:
                errs = compare(name, sdf, con.execute(oracles[name]).df())
            else:
                errs = []
            status = "ok" if not errs else "FAIL"
        except Exception as exc:  # noqa: BLE001 — report, keep sweeping
            errs, status = [f"exception: {exc}"[:300]], "FAIL"
        dt = time.perf_counter() - t0
        tag = "" if name in oracles else " (rows-only)"
        print(f"{status:5s} {name}{tag} [{dt:.1f}s]")
        if errs:
            failed.append(name)
            for e in errs:
                print(f"      {e}")
        spark.catalog.clearCache()
    print(f"\n{len(failed)} failures" + (f": {failed}" if failed else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
