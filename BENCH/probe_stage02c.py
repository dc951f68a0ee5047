"""Bisect the same-JVM stage-02 slowdown (probe_stage02b reproduced
it: 26 s fresh-JVM vs 105 s after stage 01 at local[8]; a second
stage-02 pass in the same JVM stays 3x slow, so the state is
persistent).

Method: time an IDENTICAL pure-JVM stage-02 body (read committed
indicators parquet -> with_block_key -> persist -> histogram ->
broadcast-refine -> parquet write) BEFORE and AFTER running stage 01,
bracketing every phase with the JVM's GarbageCollectorMXBean counters
and heap gauges — if the after-run's wall gap is GC time, the beans
say so directly; if not, the gap is elsewhere (scheduler, Arrow
allocator, page cache).

Usage: spark-submit --master local[8] ... probe_stage02c.py \
    --corpus /dev/shm/scale_r6e/corpus.parquet \
    --ind /dev/shm/probe02/ind_8 --work /dev/shm/probe02c
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
    ap.add_argument("--ind", required=True, help="pre-committed indicators parquet")
    ap.add_argument("--work", required=True)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.storagelevel import StorageLevel

    from polars_iptools_spark.functions._par import ensure_parallelism
    from polars_iptools_spark.plans import blocking
    from polars_iptools_spark.sources.corpus import read_corpus

    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    work = Path(args.work)
    shutil.rmtree(work, ignore_errors=True)
    work.mkdir(parents=True)

    jmx = spark.sparkContext._jvm.java.lang.management.ManagementFactory

    def jvm_gauges() -> dict:
        g = {"gc": {}, "heap_used_mb": None, "offheap_used_mb": None}
        for b in jmx.getGarbageCollectorMXBeans():
            g["gc"][b.getName()] = {
                "count": b.getCollectionCount(),
                "ms": b.getCollectionTime(),
            }
        mem = jmx.getMemoryMXBean()
        g["heap_used_mb"] = mem.getHeapMemoryUsage().getUsed() // (1 << 20)
        g["offheap_used_mb"] = mem.getNonHeapMemoryUsage().getUsed() // (1 << 20)
        return g

    def stage02_body(tag: str) -> dict:
        ind = spark.read.parquet(args.ind)
        g0, t0 = jvm_gauges(), time.monotonic()
        blocked = blocking.with_block_key(ind).persist(StorageLevel.MEMORY_AND_DISK)
        refined = blocking.refine_oversized_blocks(
            blocked, blocking.block_histogram(blocked), 256
        )
        dest = work / f"refined_{tag}"
        refined.write.mode("overwrite").parquet(str(dest))
        wall = time.monotonic() - t0
        g1 = jvm_gauges()
        blocked.unpersist()
        shutil.rmtree(dest, ignore_errors=True)
        gc_ms = sum(v["ms"] for v in g1["gc"].values()) - sum(
            v["ms"] for v in g0["gc"].values()
        )
        return {
            "tag": tag,
            "wall": round(wall, 2),
            "gc_ms": gc_ms,
            "heap_mb_end": g1["heap_used_mb"],
            "gc_detail": g1["gc"],
        }

    out = {"cores": spark.sparkContext.defaultParallelism, "phases": []}
    out["phases"].append(stage02_body("before_a"))
    out["phases"].append(stage02_body("before_b"))

    corpus = read_corpus(spark, args.corpus)
    g0, t0 = jvm_gauges(), time.monotonic()
    blocking.extract_indicators(ensure_parallelism(corpus)).write.mode(
        "overwrite"
    ).parquet(str(work / "ind_fresh"))
    g1 = jvm_gauges()
    out["phases"].append(
        {
            "tag": "stage01",
            "wall": round(time.monotonic() - t0, 2),
            "gc_ms": sum(v["ms"] for v in g1["gc"].values())
            - sum(v["ms"] for v in g0["gc"].values()),
            "heap_mb_end": g1["heap_used_mb"],
        }
    )

    out["phases"].append(stage02_body("after_a"))
    out["phases"].append(stage02_body("after_b"))
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
