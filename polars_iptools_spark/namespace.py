"""Fluent namespace API — parity with the reference's ``.ip`` /
``.geoip`` / ``.spur`` Expr/Series namespaces
(/root/reference/polars_iptools/iptools.py:534-700, geoip.py:139-178,
spur.py:89-122).

Spark Columns aren't user-extensible, so the namespaces are exposed as
a wrapper: ``ipcol("src_ip").is_valid()`` returns a plain Column and
chains: ``ipcol("ip").to_ipv4().to_string()``.  Deprecated methods
(``.ip.ipv4_to_numeric`` / ``.ip.numeric_to_ipv4``) warn exactly like
the reference (tests/test_extension_types.py:164-237).
"""

from __future__ import annotations

import warnings
from collections.abc import Iterable

from pyspark.sql import Column

from .functions import geoip as _geoip
from .functions import iptools as _ip
from .functions import spur as _spur


class IpCol:
    """Chainable wrapper over a Column; every method returns either a
    plain Column (terminal) or another IpCol (chainable typed value)."""

    def __init__(self, col: Column | str):
        self._col = _ip._col(col)

    @property
    def col(self) -> Column:
        return self._col

    # -- .ip namespace -----------------------------------------------
    def is_valid(self) -> Column:
        return _ip.is_valid(self._col)

    def is_private(self) -> Column:
        return _ip.is_private(self._col)

    def to_ipv4(self) -> "IpCol":
        return IpCol(_ip.to_ipv4(self._col))

    def to_address(self) -> "IpCol":
        return IpCol(_ip.to_address(self._col))

    def to_string(self) -> Column:
        return _ip.to_string(self._col)

    # aliases kept by the reference namespace
    def to_native(self) -> "IpCol":
        return self.to_ipv4()

    def to_canonical(self) -> Column:
        return self.to_string()

    def is_in(self, networks: Iterable[str]) -> Column:
        return _ip.is_in(self._col, networks)

    def extract_ips(self, **kwargs) -> Column:
        return _ip.extract_ips(self._col, **kwargs)

    def extract_public_ips(self, ipv6: bool = False) -> Column:
        return _ip.extract_public_ips(self._col, ipv6=ipv6)

    def extract_private_ips(self, ipv6: bool = False) -> Column:
        return _ip.extract_private_ips(self._col, ipv6=ipv6)

    def extract_all_ips(self, **kwargs) -> Column:
        return _ip.extract_all_ips(self._col, **kwargs)

    # deprecated methods, preserved with warnings like the reference
    def ipv4_to_numeric(self) -> Column:
        warnings.warn(
            "ip.ipv4_to_numeric() is deprecated, use to_ipv4() instead",
            DeprecationWarning,
            stacklevel=2,
        )
        return _ip.ipv4_to_numeric(self._col)

    def numeric_to_ipv4(self) -> Column:
        warnings.warn(
            "ip.numeric_to_ipv4() is deprecated, use to_string() instead",
            DeprecationWarning,
            stacklevel=2,
        )
        return _ip.numeric_to_ipv4(self._col)

    # -- .geoip namespace ----------------------------------------------
    def geoip_asn(self, reload_mmdb: bool = False, db_dir: str | None = None) -> Column:
        return _geoip.asn(self._col, reload_mmdb=reload_mmdb, db_dir=db_dir)

    def geoip_full(self, reload_mmdb: bool = False, db_dir: str | None = None) -> Column:
        return _geoip.full(self._col, reload_mmdb=reload_mmdb, db_dir=db_dir)

    # -- .spur namespace -------------------------------------------------
    def spur_full(self, reload_mmdb: bool = False, db_dir: str | None = None) -> Column:
        return _spur.full(self._col, reload_mmdb=reload_mmdb, db_dir=db_dir)


def ipcol(col: Column | str) -> IpCol:
    """Entry point: ``ipcol("src").to_address().to_string()``."""
    return IpCol(col)
