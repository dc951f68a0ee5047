"""Giant-component closure wall record (skew-robust evidence).

The 9.6M-file scaling corpus yields 3.2M size-3 clusters — trivial for
closure.  This job runs connected_components on the adversarial shape:
the same sea of size-3 components PLUS one chain component spanning
~1% of nodes (maximum diameter — worst case for star contraction) and
one hub star of the same size (maximum degree — the skew case), at
corpus scale.  Records wall + superstep count; the pass criterion is
supersteps staying O(log diameter) and wall staying within a small
multiple of the uniform-corpus closure stage.

Usage: python BENCH/closure_giant.py [--nodes 9600000] [--giant-frac 0.01]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=9_600_000)
    ap.add_argument("--giant-frac", type=float, default=0.01)
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args()

    import __spark_entry__ as entry
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from polars_iptools_spark.operators.closure import connected_components

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", str(int(args.cpus) * 2))
        .config("spark.driver.memory", "48g")
        .appName("closure_giant")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    entry._ensure_importable(spark)

    # the size-3 sea tiles [0, n_small) in strides of 3 — round down so
    # its last component cannot spill into the giant-chain id range
    n_small = args.nodes - (args.nodes % 3)
    gsize = int(args.nodes * args.giant_frac)
    chain = spark.range(n_small, n_small + gsize - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    hub = n_small + gsize
    star = spark.range(hub + 1, hub + gsize).select(
        F.lit(hub).alias("src"), F.col("id").alias("dst")
    )
    small = spark.range(0, n_small, 3).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    ).union(
        spark.range(0, n_small, 3).select(
            F.col("id").alias("src"), (F.col("id") + 2).alias("dst")
        )
    )
    edges = chain.union(star).union(small).repartition(int(args.cpus) * 2)
    n_edges = edges.cache().count()

    def loadavg():
        try:
            with open("/proc/loadavg") as f:
                return float(f.read().split()[0])
        except OSError:
            return None

    load_start = loadavg()
    stats: dict = {}
    t0 = time.monotonic()
    comp = connected_components(edges, stats=stats)
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("n"))
    big = {
        int(r.component): int(r.n)
        for r in sizes.where(F.col("n") > 3).collect()
    }
    n_components = sizes.count()
    wall = time.monotonic() - t0

    assert big == {n_small: gsize, hub: gsize}, big
    result = {
        "nodes": args.nodes + 2 * gsize,
        "edges": n_edges,
        "giant_chain_size": gsize,
        "giant_star_size": gsize,
        "small_components": n_small // 3,
        "components_total": n_components,
        "supersteps": stats.get("supersteps"),
        "wall_sec": round(wall, 2),
        "normalize_s": stats.get("normalize_s"),
        "peel_after": stats.get("peel_after"),
        "superstep_walls": stats.get("superstep_walls"),
        "loadavg_start": load_start,
        "loadavg_end": loadavg(),
        "cpus": int(args.cpus),
        "membership_check": "pass",
    }
    out = Path(__file__).resolve().parent / "closure_giant_result.json"
    out.write_text(json.dumps(result, indent=2))
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
