"""Full-fidelity reproduction of the 02_refined anti-scaling anomaly
(r6e sweep: 51 s at local[2] vs 155 s at local[8], same healthy epoch)
— the ISOLATED probe (probe_stage02.py) measured stage 02 at only
26 s/55 s (8/2 cores), so the +125 s appears ONLY when stage 02 runs
in the same JVM right after stage 01, exactly as run_pipeline does.

This probe replays that context: a fresh StageRunner checkpoint, the
REAL stage 01 (pandas-UDF extraction from the corpus), then the REAL
stage 02 body copied from plans/pipeline.py, all in one JVM — then a
SECOND stage-02 pass (fresh ckpt name, same JVM) to split persistent
JVM state from a one-time interaction.

Usage: spark-submit --master local[N] ... probe_stage02b.py \
    --corpus /dev/shm/scale_r6e/corpus.parquet --work /dev/shm/probe02b
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
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.storagelevel import StorageLevel

    from polars_iptools_spark.functions._par import ensure_parallelism
    from polars_iptools_spark.plans import blocking
    from polars_iptools_spark.plans.checkpoint import StageRunner
    from polars_iptools_spark.sources.corpus import read_corpus

    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism
    work = Path(args.work) / f"c{cores}"
    shutil.rmtree(work, ignore_errors=True)

    corpus = read_corpus(spark, args.corpus)
    corpus.count()  # warm the scan, as run_scaling.py does

    runner = StageRunner(spark, work / "ckpt")
    t0 = time.monotonic()
    indicators = runner.stage(
        "01_indicators", lambda: blocking.extract_indicators(ensure_parallelism(corpus))
    )
    w01 = time.monotonic() - t0

    def refined_body(name: str) -> float:
        t0 = time.monotonic()
        holder: list = []

        def _refined():
            blocked = blocking.with_block_key(indicators).persist(
                StorageLevel.MEMORY_AND_DISK
            )
            holder.append(blocked)
            return blocking.refine_oversized_blocks(
                blocked, blocking.block_histogram(blocked), 256
            )

        runner.stage(name, _refined)
        for df in holder:
            df.unpersist()
        return time.monotonic() - t0

    w02a = refined_body("02_refined")
    w02b = refined_body("02_refined_again")

    out = {
        "cores": cores,
        "stage01": round(w01, 2),
        "stage02_first": round(w02a, 2),
        "stage02_again": round(w02b, 2),
        "runner_walls": {k: v["wall_sec"] for k, v in runner.metrics.items()},
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
