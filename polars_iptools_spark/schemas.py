"""Fixed output schemas, mirrored from the reference.

Field order is authoritative from the reference's Rust builders:
geoip struct order per /root/reference/src/maxmind.rs:15-26 (confirmed
by tests/test_geoip.py:44-62), spur struct order per
/root/reference/src/spurdb.rs:16-28.  Spark has no unsigned ints, so
the reference's UInt32 fields map to LongType (values fit 0..2^32-1).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# reference: src/maxmind.rs:15-26 — asnnum, asnorg, city, continent,
# country, country_iso, latitude, longitude, postalcode, subdivision,
# subdivision_iso, timezone
GEOIP_FIELDS = [
    ("asnnum", LongType()),
    ("asnorg", StringType()),
    ("city", StringType()),
    ("continent", StringType()),
    ("country", StringType()),
    ("country_iso", StringType()),
    ("latitude", DoubleType()),
    ("longitude", DoubleType()),
    ("postalcode", StringType()),
    ("subdivision", StringType()),
    ("subdivision_iso", StringType()),
    ("timezone", StringType()),
]
GEOIP_SCHEMA = StructType([StructField(n, t, True) for n, t in GEOIP_FIELDS])

# reference: src/spurdb.rs:16-28 — client_count, infrastructure,
# location_city, location_country, location_state, services, tag
SPUR_FIELDS = [
    ("client_count", FloatType()),
    ("infrastructure", StringType()),
    ("location_city", StringType()),
    ("location_country", StringType()),
    ("location_state", StringType()),
    ("services", ArrayType(StringType())),
    ("tag", StringType()),
]
SPUR_SCHEMA = StructType([StructField(n, t, True) for n, t in SPUR_FIELDS])

# BASELINE.json input_hint: the record-linkage corpus table shape
CORPUS_SCHEMA = StructType(
    [
        StructField("repo", StringType(), True),
        StructField("path", StringType(), True),
        StructField("commit", StringType(), True),
        StructField("lang", StringType(), True),
        StructField("content", StringType(), True),
    ]
)

EDGE_SCHEMA = StructType(
    [StructField("src", LongType(), False), StructField("dst", LongType(), False)]
)

BOOL = BooleanType()
