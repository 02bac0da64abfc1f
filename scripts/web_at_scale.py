"""Scale measurement for the round-12 web-pipeline family.

Synthesizes document corpora of n = 5k / 50k / 500k rows (the 500k
point is 100x the sf0.1 fixture) with ~270-char md5-derived texts,
writes each as a ``documents.parquet`` under ``_derived/webscale/``,
and measures the REGISTERED queries against those dirs:

- ``web_html_extract``: render + regexp extraction, forced through an
  aggregate tail (SUM(main_chars)) so the wall measures the operator,
  not a 500k-row driver transfer. Pure per-row work: pass bar is
  exponent ~1.
- ``web_url_dedup``: canonicalization + the canonical-key groupBy.
  The fixture rule gives only 40 canonical classes, so at 500k rows
  every class is a hot key — the measurement doubles as a skew check
  on the aggregate path (map-side partial aggregation must absorb
  it; a row-shuffle-per-doc plan would collapse).
- ``web_link_graph``: regexp_extract_all + explode (4 hrefs/row) +
  the host-pair aggregate.

Usage: python scripts/web_at_scale.py [n ...]   (default 5000 50000 500000)
"""
from __future__ import annotations

import json
import math
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from integrator_spark.registry import get_queries  # noqa: E402
from integrator_spark.session import build_session  # noqa: E402


def synth_dir(spark, n: int, root: str) -> str:
    d = os.path.join(root, f"n{n}")
    marker = os.path.join(d, "_done")
    if not os.path.exists(marker):
        text = F.concat_ws(" ", *[
            F.md5(F.concat(F.col("id").cast("string"), F.lit(f":{j}")))
            for j in range(8)])
        (spark.range(n)
         .select(F.col("id").alias("doc_id"),
                 text.alias("text"),
                 F.lit("en").alias("lang"),
                 F.concat(F.lit("src"), (F.col("id") % 20).cast("string"))
                  .alias("source"),
                 F.length(text).cast("long").alias("n_chars"))
         .write.mode("overwrite")
         .parquet(os.path.join(d, "documents.parquet")))
        open(marker, "w").close()
    return d


def main() -> None:
    ns = [int(a) for a in sys.argv[1:]] or [5_000, 50_000, 500_000]
    spark = build_session("web-at-scale")
    qs = get_queries()
    root = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "_derived", "webscale")
    results: dict[str, dict[int, float]] = {}

    def timed(fn):
        walls = []
        for _ in range(3):
            t0 = time.time()
            fn()
            walls.append(time.time() - t0)
        return statistics.median(walls)

    # Warm the session (codegen, Arrow, shuffle service) on the
    # smallest corpus so the first measured point isn't JVM startup.
    warm = synth_dir(spark, ns[0], root)
    for q in ("web_html_extract", "web_url_dedup", "web_link_graph"):
        qs[q](spark, warm).collect()

    for n in ns:
        sf_dir = synth_dir(spark, n, root)
        spark.read.parquet(
            os.path.join(sf_dir, "documents.parquet")).count()  # warm FS
        results.setdefault("web_html_extract", {})[n] = timed(
            lambda: qs["web_html_extract"](spark, sf_dir)
            .agg(F.sum("main_chars")).collect())
        results.setdefault("web_url_dedup", {})[n] = timed(
            lambda: qs["web_url_dedup"](spark, sf_dir).collect())
        results.setdefault("web_link_graph", {})[n] = timed(
            lambda: qs["web_link_graph"](spark, sf_dir).collect())
        print(f"n={n}: " + ", ".join(
            f"{q}={results[q][n]:.2f}s" for q in results), flush=True)

    print("\n| query | " + " | ".join(f"n={n}" for n in ns)
          + " | exponent |")
    print("| --- |" + " ---: |" * (len(ns) + 1))
    summary = {}
    for q, walls in results.items():
        xs = sorted(walls)
        expo = (math.log10(walls[xs[-1]] / walls[xs[0]])
                / math.log10(xs[-1] / xs[0]))
        summary[q] = {"walls": walls, "exponent": round(expo, 2)}
        print(f"| {q} | " + " | ".join(f"{walls[n]:.2f}s" for n in ns)
              + f" | {expo:.2f} |")
    print(json.dumps({"metric": "web_at_scale", "ns": ns,
                      "results": summary}))


if __name__ == "__main__":
    main()
