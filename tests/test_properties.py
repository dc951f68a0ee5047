"""Property-style randomized cross-validation: thousands of generated
strings through the engine in ONE Spark job each, compared against
stdlib ``ipaddress`` (the closest public proxy for the Rust parser the
reference uses)."""

import ipaddress
import random

import polars_iptools_spark as ip


def _gen_cases(n=2500, seed=1234):
    rnd = random.Random(seed)
    out = []
    for _ in range(n):
        kind = rnd.randrange(10)
        if kind < 3:  # valid v4
            out.append(".".join(str(rnd.randrange(256)) for _ in range(4)))
        elif kind < 5:  # corrupted v4
            s = ".".join(str(rnd.randrange(1000)) for _ in range(rnd.randrange(2, 6)))
            if rnd.random() < 0.3:
                s = "0" + s
            out.append(s)
        elif kind < 7:  # valid-ish v6
            groups = [format(rnd.randrange(0x10000), "x") for _ in range(8)]
            if rnd.random() < 0.5:
                cut = rnd.randrange(1, 7)
                keep = rnd.randrange(0, 7 - cut)
                s = ":".join(groups[:keep]) + "::" + ":".join(groups[keep + cut:])
            else:
                s = ":".join(groups)
            out.append(s)
        elif kind < 8:  # v6 with embedded v4
            head = ":".join(format(rnd.randrange(0x10000), "x") for _ in range(rnd.randrange(0, 6)))
            v4 = ".".join(str(rnd.randrange(256)) for _ in range(4))
            out.append((head + "::" if head else "::") + v4)
        else:  # garbage
            alphabet = "0123456789abcdefg.::%"
            out.append("".join(rnd.choice(alphabet) for _ in range(rnd.randrange(1, 24))))
    return out


def _oracle_valid(s):
    try:
        ipaddress.ip_address(s)
        return True
    except ValueError:
        return False


def test_is_valid_matches_ipaddress_bulk(spark):
    cases = [c for c in _gen_cases() if "%" not in c]  # no zone-ids (Rust rejects)
    df = spark.createDataFrame([(c,) for c in cases], "s string")
    got = [r.r for r in df.select(ip.is_valid("s").alias("r")).collect()]
    bad = [
        (c, g, _oracle_valid(c))
        for c, g in zip(cases, got)
        if g != _oracle_valid(c)
    ]
    assert not bad, bad[:10]


def test_roundtrip_address_matches_ipaddress_bulk(spark):
    cases = [c for c in _gen_cases(1500, seed=77) if "%" not in c]
    df = spark.createDataFrame([(c,) for c in cases], "s string")
    got = [
        r.r for r in df.select(ip.to_string(ip.to_address("s")).alias("r")).collect()
    ]
    for c, g in zip(cases, got):
        try:
            expected = str(ipaddress.ip_address(c))
        except ValueError:
            expected = None
        assert g == expected, (c, g, expected)


def test_numeric_roundtrip_bulk(spark):
    rnd = random.Random(5)
    nums = [rnd.randrange(0, 2**32) for _ in range(2000)] + [2**32, -1, 2**33]
    df = spark.createDataFrame([(n,) for n in nums], "n long")
    got = [
        r.r
        for r in df.select(
            ip.ipv4_to_numeric(ip.numeric_to_ipv4("n")).alias("r")
        ).collect()
    ]
    for n, g in zip(nums, got):
        expected = n if 0 <= n <= 0xFFFFFFFF else None
        assert g == expected, (n, g)


def test_is_in_matches_ipaddress_bulk(spark):
    rnd = random.Random(3)
    nets = [
        f"{rnd.randrange(1,224)}.{rnd.randrange(256)}.0.0/{rnd.choice([12,16,20,24])}"
        for _ in range(40)
    ] + ["2001:db8::/32"]
    nets = sorted(set(nets))
    parsed = [ipaddress.ip_network(n, strict=False) for n in nets]
    cases = [c for c in _gen_cases(1200, seed=9) if "%" not in c]
    df = spark.createDataFrame([(c,) for c in cases], "s string")
    got = [r.r for r in df.select(ip.is_in("s", nets).alias("r")).collect()]
    for c, g in zip(cases, got):
        try:
            addr = ipaddress.ip_address(c)
            expected = any(
                addr.version == p.version and addr in p for p in parsed
            )
        except ValueError:
            expected = None
        assert g == expected, (c, g, expected)
