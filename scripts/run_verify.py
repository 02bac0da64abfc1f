"""Drive the __spark_entry__ driver contract end-to-end, exactly as the
verification driver does (see .claude/skills/verify/SKILL.md).

Fresh process, default SparkSession confs, sf0.001 entry smoke, then every
queries() entry at sf0.01 compared to its oracle_sql() in DuckDB by
sorted-column stringified exact match. Usage:

    python scripts/run_verify.py [name_substring ...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as ent  # noqa: E402
from integrator_spark.testing import canonical_strings  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
SF_DIR = os.environ.get("SPARK_GRAFT_VERIFY_SF", "/root/testdata/sf0.01")


def main() -> int:
    filters = sys.argv[1:]
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.ui.enabled", "false").getOrCreate())

    rows = ent.entry(spark).collect()
    print(f"entry smoke: {len(rows)} rows", flush=True)
    assert len(rows) > 0

    qs, osql = ent.queries(), ent.oracle_sql()
    names = [n for n in qs if not filters or any(f in n for f in filters)]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")

    t0 = time.time()
    fails = []
    for i, name in enumerate(names, 1):
        try:
            spdf = qs[name](spark, SF_DIR).toPandas()
            if name not in osql:
                print(f"[{i}/{len(names)}] {name}: ROWS-ONLY "
                      f"spark={len(spdf)}", flush=True)
                continue
            opdf = con.execute(osql[name]).df()
            s, o = canonical_strings(spdf), canonical_strings(opdf)
            if len(spdf) != len(opdf):
                fails.append(name)
                print(f"[{i}/{len(names)}] {name}: FAIL rowcount "
                      f"spark={len(spdf)} oracle={len(opdf)}", flush=True)
            elif s != o:
                fails.append(name)
                bad = next(j for j, (a, b) in enumerate(zip(s, o)) if a != b)
                print(f"[{i}/{len(names)}] {name}: FAIL values at row {bad}\n"
                      f"  spark : {s[bad][:200]}\n"
                      f"  oracle: {o[bad][:200]}", flush=True)
            else:
                print(f"[{i}/{len(names)}] {name}: PASS "
                      f"spark={len(spdf)} oracle={len(opdf)}", flush=True)
        except Exception as e:  # noqa: BLE001
            fails.append(name)
            print(f"[{i}/{len(names)}] {name}: ERROR {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
    print(f"TOTAL {len(names)} queries, fails={fails}, "
          f"wall={time.time() - t0:.1f}s", flush=True)
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
