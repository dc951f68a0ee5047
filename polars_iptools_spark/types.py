"""Typed-IP column conventions.

Spark has no user extension types, so the reference's ``IPv4`` (u32
storage, /root/reference/polars_iptools/types.py:25) and ``IPAddress``
(16-byte binary, types.py:61) become plain LongType / BinaryType
columns tagged with schema **field metadata** — which Spark preserves
through parquet write/read, giving the same IO round-trip guarantee the
reference tests at tests/test_extension_types.py:243-305.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql.types import StructField

IPV4_DTYPE = "ipv4"
IPADDRESS_DTYPE = "ip_address"
IP_DTYPES = frozenset({IPV4_DTYPE, IPADDRESS_DTYPE})

_META_KEY = "ip_dtype"


def as_ipv4(col: Column, name: str) -> Column:
    """Alias a u32-storage column with IPv4 extension metadata."""
    return col.alias(name, metadata={_META_KEY: IPV4_DTYPE})


def as_ip_address(col: Column, name: str) -> Column:
    """Alias a 16-byte binary column with IPAddress extension metadata."""
    return col.alias(name, metadata={_META_KEY: IPADDRESS_DTYPE})


def ip_dtype_of(field: StructField) -> str | None:
    """The IP extension tag of a schema field, or None."""
    md = field.metadata or {}
    v = md.get(_META_KEY)
    return v if v in IP_DTYPES else None


def is_ip_column(field: StructField) -> bool:
    """Membership test mirroring the reference's IP_DTYPES frozenset
    (/root/reference/polars_iptools/types.py:80)."""
    return ip_dtype_of(field) is not None


def ip_columns(df: DataFrame) -> dict[str, str]:
    """Map of column name -> ip dtype tag for all tagged columns."""
    return {
        f.name: ip_dtype_of(f) for f in df.schema.fields if is_ip_column(f)
    }


def to_arrow_tagged(df: DataFrame):
    """Collect to a pyarrow Table with the ip dtype tags carried as
    Arrow FIELD metadata — the IPC-file analog of the reference's
    extension-type round-trip (tests/test_extension_types.py:278-305):
    ``pa.ipc`` writes/reads this table with the tags intact."""
    import pyarrow as pa

    tbl = df.toArrow()
    tags = ip_columns(df)
    fields = []
    for f in tbl.schema:
        if f.name in tags:
            md = dict(f.metadata or {})
            md[_META_KEY.encode()] = tags[f.name].encode()
            f = f.with_metadata(md)
        fields.append(f)
    return pa.Table.from_arrays(tbl.columns, schema=pa.schema(fields))


def from_arrow_tagged(spark, tbl) -> DataFrame:
    """pyarrow Table (e.g. read back from an IPC file) -> DataFrame with
    the ip dtype tags restored as Spark field metadata."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(tbl)
    cols = []
    for f in tbl.schema:
        tag = (f.metadata or {}).get(_META_KEY.encode())
        if tag is not None and tag.decode() in IP_DTYPES:
            cols.append(
                F.col(f.name).alias(f.name, metadata={_META_KEY: tag.decode()})
            )
        else:
            cols.append(F.col(f.name))
    return df.select(cols)
