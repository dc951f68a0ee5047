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
