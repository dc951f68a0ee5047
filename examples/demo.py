"""End-to-end demo mirroring the reference's run.py
(/root/reference/run.py:18-29): read ndjson logs, extract + enrich all
IPs, write ndjson.

    python examples/demo.py <in.ndjson> <out_dir> [mmdb_dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import polars_iptools_spark as ip  # noqa: E402


def main() -> None:
    src, out = sys.argv[1], sys.argv[2]
    mmdb = sys.argv[3] if len(sys.argv) > 3 else None
    spark = ip.get_spark(app_name="iptools-demo")
    logs = spark.read.json(src)
    enriched = (
        logs.withColumn("ips", ip.extract_ips(F.col("message"), ipv6=True))
        .withColumn("ipaddr", F.explode_outer("ips"))
        .withColumn("valid", ip.is_valid("ipaddr"))
        .withColumn("private", ip.is_private("ipaddr"))
        .withColumn("geo", ip.geoip.full("ipaddr", db_dir=mmdb))
    )
    enriched.write.mode("overwrite").json(out)
    print(f"wrote {enriched.count()} rows to {out}")
    spark.stop()


if __name__ == "__main__":
    main()
