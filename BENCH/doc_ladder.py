"""Doc-operator scale ladder: time the four document/embedding
operators (minhash LSH, simhash, brute-force ANN, banded LSH ANN) at an
arbitrary SF directory, with external-CPU adjudication telemetry.

The sf1.0 ladder (BENCH/BASELINE.md §3b) showed minhash/simhash/ann
walls growing 4.0x/1.9x/2.3x at 10x the documents — sub-quadratic, as
the bucketed designs promise.  This script adds the NEXT decade
(--copies 100 -> 500k docs / 200k vectors via BENCH/make_sf1.py
--tables documents,embeddings) so the growth curve has three points
and the corpus-sized n_planes auto-sizing is exercised where it
matters.

Usage:
  python BENCH/make_sf1.py --copies 100 --out /tmp/sf10 \
      --tables documents,embeddings
  python BENCH/doc_ladder.py --sf-dir /tmp/sf10 \
      --out BENCH/doc_ladder_sf10_result.json
"""

from __future__ import annotations

import argparse
import json
import math
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/sf10")
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default="BENCH/doc_ladder_result.json")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from BENCH.sysload import ExternalCpuMeter
    from polars_iptools_spark.operators import dedup, similarity
    from polars_iptools_spark.session import get_spark

    spark = get_spark(
        app_name="doc_ladder",
        master=f"local[{args.cpus}]",
        shuffle_partitions=int(args.cpus),
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "48g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = (
        spark.read.parquet(f"{args.sf_dir}/documents.parquet")
        .repartition(int(args.cpus) * 2)
        .cache()
    )
    n_docs = docs.count()
    emb = (
        spark.read.parquet(f"{args.sf_dir}/embeddings.parquet")
        .repartition(int(args.cpus) * 2)
        .cache()
    )
    n_emb = emb.count()

    def force(df) -> int:
        return df.agg(F.count(F.lit(1))).collect()[0][0]

    result: dict = {
        "sf_dir": args.sf_dir,
        "docs": n_docs,
        "vectors": n_emb,
        "cpus": int(args.cpus),
        "rep_protocol": f"median of {args.reps}",
        "queries": {},
        "pair_counts": {},
    }

    def bench(name, fn):
        runs, rows = [], None
        with ExternalCpuMeter() as meter:
            for _ in range(args.reps):
                t0 = time.monotonic()
                rows = fn()
                runs.append(round(time.monotonic() - t0, 3))
        result["queries"][name] = {
            "median_sec": round(statistics.median(runs), 3),
            "reps": runs,
            "external_cores_avg": meter.external_cores_avg,
        }
        result["pair_counts"][name] = rows

    bench(
        "minhash_lsh",
        lambda: force(
            dedup.minhash_lsh_pairs(
                docs, "doc_id", "text", k=3, num_hashes=32, bands=8, threshold=0.5
            )
        ),
    )
    bench(
        "simhash_pairs",
        lambda: force(dedup.simhash_pairs(docs, "doc_id", "text", 3, 4)),
    )

    q = emb.where(f"vec_id % {max(n_emb // 8, 1)} = 0").limit(8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    bench("ann_topk", lambda: force(similarity.brute_force_topk(emb, q, k=10)))

    n_planes = max(6, math.ceil(math.log2(max(n_emb, 64) / 32)))
    dim = len(emb.select("embedding").first()[0])
    result["ann_lsh_n_planes"] = n_planes
    bench(
        "ann_lsh_banded",
        lambda: force(
            similarity.lsh_near_duplicates(
                emb, dim=dim, threshold=0.3, n_tables=16, n_planes=n_planes
            )
        ),
    )

    result["total_sec"] = round(
        sum(v["median_sec"] for v in result["queries"].values()), 3
    )
    Path(args.out).write_text(json.dumps(result, indent=2))
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
