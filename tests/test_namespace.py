"""Fluent namespace parity tests, incl. deprecation warnings
(reference tests/test_extension_types.py:130-237)."""

import warnings

from polars_iptools_spark.namespace import ipcol

from conftest import MAXMIND_TEST_DIR


def run(spark, data, expr):
    df = spark.createDataFrame([(x,) for x in data], "ip string")
    return [r.result for r in df.select(expr.alias("result")).collect()]


def test_namespace_chain_to_string(spark):
    """.ip.to_ipv4().ip.to_string() analog."""
    got = run(spark, ["8.8.8.8", "1.1.1.1"], ipcol("ip").to_ipv4().to_string())
    assert got == ["8.8.8.8", "1.1.1.1"]


def test_namespace_to_address_chain(spark):
    got = run(
        spark, ["8.8.8.8", "2606:4700::1111"], ipcol("ip").to_address().to_string()
    )
    assert got == ["8.8.8.8", "2606:4700::1111"]


def test_namespace_aliases(spark):
    got = run(spark, ["8.8.8.8"], ipcol("ip").to_native().to_canonical())
    assert got == ["8.8.8.8"]


def test_namespace_scalar_ops(spark):
    assert run(spark, ["8.8.8.8", "abcd"], ipcol("ip").is_valid()) == [True, False]
    assert run(spark, ["10.0.0.1"], ipcol("ip").is_private()) == [True]
    assert run(spark, ["8.8.8.8"], ipcol("ip").is_in(["8.8.8.0/24"])) == [True]
    assert run(spark, ["x 8.8.8.8 y"], ipcol("ip").extract_public_ips()) == [
        ["8.8.8.8"]
    ]


def test_deprecated_ipv4_to_numeric_warns_and_works(spark):
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        expr = ipcol("ip").ipv4_to_numeric()
        assert len(w) == 1
        assert issubclass(w[0].category, DeprecationWarning)
        assert "deprecated" in str(w[0].message).lower()
    assert run(spark, ["8.8.8.8", "192.168.30.30"], expr) == [134744072, 3232243230]


def test_deprecated_numeric_to_ipv4_warns_and_works(spark):
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        expr = ipcol("ip").numeric_to_ipv4()
        assert len(w) == 1
        assert issubclass(w[0].category, DeprecationWarning)
    df = spark.createDataFrame([(134744072,), (3232243230,)], "ip long")
    got = [r.result for r in df.select(expr.alias("result")).collect()]
    assert got == ["8.8.8.8", "192.168.30.30"]


def test_namespace_geoip(spark):
    got = run(
        spark, ["67.43.156.1"], ipcol("ip").geoip_asn(db_dir=MAXMIND_TEST_DIR)
    )
    assert got == ["AS35908"]


def test_env_var_db_resolution(spark, monkeypatch):
    """MAXMIND_MMDB_DIR resolution like src/maxmind.rs:82-106."""
    monkeypatch.setenv("MAXMIND_MMDB_DIR", MAXMIND_TEST_DIR)
    got = run(spark, ["67.43.156.1"], ipcol("ip").geoip_asn(reload_mmdb=True))
    assert got == ["AS35908"]
