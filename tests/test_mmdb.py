"""Unit tests for the pure-Python MMDB decoder against the reference's
miniature GeoLite2 fixtures (same files the reference pytest uses)."""

import ipaddress

import numpy as np

from polars_iptools_spark.sources.mmdb import MMDBFile, load_interval_table

ASN = "/root/reference/tests/maxmind/GeoLite2-ASN.mmdb"
CITY = "/root/reference/tests/maxmind/GeoLite2-City.mmdb"


def _key(ip: str) -> np.ndarray:
    a = ipaddress.ip_address(ip)
    v = int(a) | (0xFFFF00000000 if a.version == 4 else 0)
    return np.array([v.to_bytes(16, "big")], dtype="|S16")


def test_metadata():
    f = MMDBFile(ASN)
    assert f.metadata["database_type"] == "GeoLite2-ASN"
    assert f.record_size in (24, 28, 32)
    assert f.ip_version == 6


def test_asn_goldens():
    t = load_interval_table(ASN)
    i = t.lookup_indices(_key("67.43.156.1"))[0]
    assert t.records[i] == {"autonomous_system_number": 35908}
    i = t.lookup_indices(_key("240b::beef:0:24"))[0]
    assert t.records[i]["autonomous_system_organization"] == "KDDI KDDI CORPORATION"
    assert t.lookup_indices(_key("192.168.1.1"))[0] == -1


def test_city_goldens():
    t = load_interval_table(CITY)
    i = t.lookup_indices(_key("202.196.224.99"))[0]
    rec = t.records[i]
    assert rec["country"]["iso_code"] == "PH"
    assert rec["location"]["latitude"] == 13.0
    assert rec["postal"]["code"] == "34021"


def test_intervals_sorted_disjoint():
    t = load_interval_table(ASN)
    los = t.lo.astype(bytes)
    his = t.hi.astype(bytes)
    assert all(los[i] <= his[i] for i in range(len(los)))
    assert all(his[i] < los[i + 1] for i in range(len(los) - 1))


def test_vectorized_lookup_matches_scalar():
    t = load_interval_table(ASN)
    ips = ["67.43.156.1", "8.8.8.8", "240b::beef:0:24", "1.1.1.1"]
    keys = np.array(
        [_key(i)[0] for i in ips], dtype="|S16"
    )
    idx = t.lookup_indices(keys)
    for j, ipstr in enumerate(ips):
        assert idx[j] == t.lookup_indices(_key(ipstr))[0]
