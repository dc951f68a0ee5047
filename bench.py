"""Headline benchmark: one JSON line on stdout.

Runs the engine's representative queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] (default all
cores).  Each query is forced with a cheap aggregate so timing measures
the full plan, not collect serialization.

Every query runs $SPARK_GRAFT_BENCH_REPS times (default 3) and the
reported per-query number is the MEDIAN; per-rep raw times and the min
ride along under "reps"/"min".  The sandbox has noisy-neighbor phases
where a single run can be 2x off — a one-shot protocol let one noisy
window define a whole round's record.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
import polars_iptools_spark as ip  # noqa: E402
from polars_iptools_spark.operators import dedup, similarity  # noqa: E402
from polars_iptools_spark.plans.pipeline import run_pipeline  # noqa: E402
from polars_iptools_spark.session import get_spark  # noqa: E402
from polars_iptools_spark.sources.corpus import synth_corpus  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
REPS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
MAXMIND = "/root/reference/tests/maxmind"


def force(df) -> int:
    """Execute the whole plan, returning a row count."""
    return df.agg(F.count(F.lit(1))).collect()[0][0]


def wait_for_quiet_window() -> float:
    """Bounded wait for the 1-min load to drop below
    $SPARK_GRAFT_BENCH_LOADGATE (default 3.0) before timing anything.

    The sandbox has noisy-neighbor phases where every wall uniformly
    inflates 1.5-2x (BENCH/BASELINE.md §3); a benchmark that starts
    inside one records a number that says nothing about the engine.
    The wait is capped at $SPARK_GRAFT_BENCH_LOADGATE_MAXWAIT seconds
    (default 240) so a persistently busy host still produces a record,
    and the seconds actually waited plus the start load ride along in
    the output JSON — the gate is visible, never silent."""
    gate = float(os.environ.get("SPARK_GRAFT_BENCH_LOADGATE", "3.0"))
    max_wait = float(os.environ.get("SPARK_GRAFT_BENCH_LOADGATE_MAXWAIT", "240"))
    if gate <= 0:
        return 0.0
    t0 = time.monotonic()
    while time.monotonic() - t0 < max_wait and os.getloadavg()[0] > gate:
        time.sleep(5)
    return round(time.monotonic() - t0, 1)


def main() -> None:
    gate_waited = wait_for_quiet_window()
    load_at_start = round(os.getloadavg()[0], 2)
    spark = get_spark(
        app_name="bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    # executors must import the package regardless of the launch cwd
    entrymod._ensure_importable(spark)

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").cache()
    li.count()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()
    n_docs = docs.count()
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()
    n_emb = emb.count()

    ips = entrymod._derived_ips(spark, SF_DIR).cache()
    n_ips = ips.count()
    texts = entrymod._derived_texts(spark, SF_DIR).cache()
    texts.count()

    timings: dict[str, float] = {}
    reps: dict[str, list[float]] = {}
    extras: dict[str, float] = {}

    def bench(name, fn):
        runs = []
        for _ in range(REPS):
            t0 = time.monotonic()
            fn()
            runs.append(round(time.monotonic() - t0, 3))
        reps[name] = runs
        timings[name] = round(statistics.median(runs), 3)

    # scalar ops, pure JVM (rows: lineitem-derived)
    bench(
        "scalar_native",
        lambda: force(
            ips.select(
                ip.is_valid("ip").alias("v"),
                ip.is_private("ip").alias("p"),
                ip.ipv4_to_numeric("ip").alias("n"),
            ).where("v or p or n > 0")
        ),
    )
    extras["scalar_native_rows_per_sec"] = round(n_ips / timings["scalar_native"])

    # Arrow-UDF typed round-trip
    bench(
        "typed_roundtrip_udf",
        lambda: force(
            ips.select(ip.to_string(ip.to_address("ip")).alias("c")).where(
                "c is not null"
            )
        ),
    )

    # CIDR membership (mixed family -> broadcast searchsorted UDF)
    nets = ["8.8.8.0/24", "10.0.0.0/8", "100.64.0.0/10", "2606:4700::/32"] + [
        f"{o}.0.0.0/8" for o in range(20, 60)
    ]
    bench("is_in_udf", lambda: force(ips.where(ip.is_in("ip", nets))))
    extras["is_in_rows_per_sec"] = round(n_ips / timings["is_in_udf"])

    # extraction, JVM-side v4 path over indicator-salted documents
    bench(
        "extract_ips_native",
        lambda: force(
            texts.select(F.explode(ip.extract_public_ips("itext")).alias("x"))
        ),
    )

    extras["extract_docs_per_sec"] = round(n_docs / timings["extract_ips_native"])

    # extraction, Arrow-UDF v6 path
    bench(
        "extract_ips_v6_udf",
        lambda: force(
            texts.select(F.explode(ip.extract_ips("itext", ipv6=True)).alias("x"))
        ),
    )

    # geo enrichment (broadcast interval table)
    bench(
        "geoip_full",
        lambda: force(
            ips.select(ip.geoip.full("ip", db_dir=MAXMIND).alias("g")).where(
                "g.asnnum is not null"
            )
        ),
    )
    extras["geoip_rows_per_sec"] = round(n_ips / timings["geoip_full"])

    # dedup family over documents
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

    # ANN top-k over embeddings
    q = emb.where("vec_id < 8").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    bench("ann_topk", lambda: force(similarity.brute_force_topk(emb, q, k=10)))

    # banded multi-table embedding LSH (bucket UDF + guarded pair join).
    # n_planes scales with the corpus so expected bucket occupancy stays
    # ~32 vectors (standard LSH sizing): a FIXED plane count at 10x the
    # vectors means 100x the candidate pairs per bucket, and the bench
    # measures the mis-parameterization, not the operator.  At the
    # sf0.1 reference scale (2,000 vectors) this resolves to the
    # historical n_planes=6, keeping round-over-round comparability.
    import math

    n_planes = max(6, math.ceil(math.log2(max(n_emb, 64) / 32)))
    dim = len(emb.select("embedding").first()[0])
    bench(
        "ann_lsh_banded",
        lambda: force(
            similarity.lsh_near_duplicates(
                emb, dim=dim, threshold=0.3, n_tables=16, n_planes=n_planes
            )
        ),
    )
    extras["ann_lsh_n_planes"] = n_planes

    # vectorized Jaro-Winkler kernel: 600k path-shaped pairs (~350k
    # unique after the batch factorize)
    from polars_iptools_spark.plans.scoring import jaro_winkler_udf

    r = F.col("rid")
    jw_pairs = ips.select(
        F.concat(
            F.lit("src/module"), (r % 37).cast("string"),
            F.lit("/handler"), (r % 97).cast("string"), F.lit(".py"),
        ).alias("s_a"),
        F.concat(
            F.lit("src/module"), (r % 37).cast("string"),
            F.lit("/handler"), ((r + 13) % 97).cast("string"), F.lit("_v2.py"),
        ).alias("s_b"),
    )
    bench(
        "scoring_jw_udf",
        lambda: force(
            jw_pairs.select(jaro_winkler_udf("s_a", "s_b").alias("jw")).where(
                "jw >= 0"
            )
        ),
    )
    extras["jw_pairs_per_sec"] = round(n_ips / timings["scoring_jw_udf"])

    # end-to-end record-linkage pipeline on the synthetic corpus;
    # each rep gets a FRESH checkpoint dir (a reused one would resume
    # instantly and time nothing)
    n_files = int(os.environ.get("SPARK_GRAFT_PIPELINE_FILES", "60000"))
    import tempfile

    corpus, _ = synth_corpus(
        spark,
        n_entities=n_files // 3,
        records_per_entity=3,
        n_blocks=max(n_files // 600, 10),
    )
    corpus = corpus.cache()
    corpus.count()

    def _pipeline_rep():
        res = run_pipeline(spark, corpus, tempfile.mkdtemp(prefix="bench_plc_"))
        res["clusters"].agg(F.count(F.lit(1))).collect()

    bench("pipeline_e2e", _pipeline_rep)
    extras["pipeline_files_per_sec"] = round(n_files / timings["pipeline_e2e"], 1)

    # Full-parallelism engine numbers (extras only — the 12 headline
    # walls above stay round-over-round comparable).  The driver's
    # sf0.1 parquet is a single row-group, so the cached inputs above
    # have ~3 partitions and every per-row wall is a 3-core number; the
    # sf1.0 ladder (BENCH/BASELINE.md §3b) showed the same operators
    # running 10x the rows in the same wall once partitioned.  These
    # reps measure the operators on the SAME data spread across all
    # cores.
    ips_par = ips.repartition(int(CPUS)).cache()
    ips_par.count()

    def _med(fn):
        runs = []
        for _ in range(REPS):
            t0 = time.monotonic()
            fn()
            runs.append(time.monotonic() - t0)
        return statistics.median(runs)

    w = _med(
        lambda: force(
            ips_par.select(
                ip.is_valid("ip").alias("v"),
                ip.is_private("ip").alias("p"),
                ip.ipv4_to_numeric("ip").alias("n"),
            ).where("v or p or n > 0")
        )
    )
    extras["scalar_par_rows_per_sec"] = round(n_ips / w)
    w = _med(
        lambda: force(
            ips_par.select(ip.geoip.full("ip", db_dir=MAXMIND).alias("g")).where(
                "g.asnnum is not null"
            )
        )
    )
    extras["geoip_par_rows_per_sec"] = round(n_ips / w)
    ips_par.unpersist()

    texts_par = texts.repartition(int(CPUS)).cache()
    texts_par.count()
    w = _med(
        lambda: force(
            texts_par.select(F.explode(ip.extract_ips("itext", ipv6=True)).alias("x"))
        )
    )
    extras["extract_v6_par_docs_per_sec"] = round(n_docs / w)
    texts_par.unpersist()

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "cpus": int(CPUS),
                "docs": n_docs,
                "derived_ip_rows": n_ips,
                "rep_protocol": f"median of {REPS}",
                "load_at_start": load_at_start,
                # end-of-run 1m/5m load: a clean start does not imply a
                # clean run in this shared sandbox (neighbor bursts
                # arrive mid-flight) — this pins whether a slow total
                # was the engine or the window
                "load_at_end": [round(x, 2) for x in os.getloadavg()[:2]],
                "loadgate_waited_s": gate_waited,
                "reps": reps,
                "min": {k: min(v) for k, v in reps.items()},
                "extras": extras,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
