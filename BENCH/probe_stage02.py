"""Probe the 02_refined stage's anti-scaling anomaly (r6e sweep:
51 s at local[2] vs 155 s at local[8] in the same healthy epoch).

Runs stage 01 once (untimed warm-up to a ckpt), then times stage 02's
sub-phases separately, several reps:

  a. persist materialization (blocked.count() after persist)
  b. histogram + broadcast-build side (hot.count())
  c. refinement join + parquet write

Usage: spark-submit --master local[N] ... probe_stage02.py \
    --corpus /dev/shm/scale_r6e/corpus.parquet --work /dev/shm/probe02
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True)
    ap.add_argument("--work", required=True)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F
    from pyspark.storagelevel import StorageLevel

    from polars_iptools_spark.functions._par import ensure_parallelism
    from polars_iptools_spark.plans import blocking
    from polars_iptools_spark.sources.corpus import read_corpus

    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism
    work = Path(args.work)
    ind_path = work / f"ind_{cores}"

    corpus = read_corpus(spark, args.corpus)
    if not (ind_path / "_SUCCESS").exists():
        t0 = time.monotonic()
        blocking.extract_indicators(ensure_parallelism(corpus)).write.mode(
            "overwrite"
        ).parquet(str(ind_path))
        print(f"stage01 ({cores} cores): {time.monotonic()-t0:.1f}s", file=sys.stderr)

    out = {"cores": cores, "reps": []}
    for rep in range(args.reps):
        indicators = spark.read.parquet(str(ind_path))
        r = {}
        t0 = time.monotonic()
        blocked = blocking.with_block_key(indicators).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        n = blocked.count()
        r["a_persist_count"] = round(time.monotonic() - t0, 2)

        t0 = time.monotonic()
        hist = blocking.block_histogram(blocked)
        hot = hist.where(F.col("block_rows") > 256)
        r["hot_blocks"] = hot.count()
        r["b_histogram"] = round(time.monotonic() - t0, 2)

        t0 = time.monotonic()
        refined = blocking.refine_oversized_blocks(blocked, hist, 256)
        dest = work / f"refined_{cores}_{rep}"
        refined.write.mode("overwrite").parquet(str(dest))
        r["c_join_write"] = round(time.monotonic() - t0, 2)
        r["rows"] = n
        blocked.unpersist()
        shutil.rmtree(dest, ignore_errors=True)
        out["reps"].append(r)
        print(json.dumps(r), file=sys.stderr)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
