"""Field-hygiene filters (operators/fieldops.py): prune/de_dot schema
surgery, byte-exact truncation vs a Python reference, urldecode,
deterministic v3 UUIDs, CIDR prefix matching vs the ipaddress module,
and tld splitting — plus the zero-shuffle plan property for the
composed chain."""

from __future__ import annotations

import ipaddress
import uuid as uuid_mod

import pytest

from pyspark.sql import functions as F

from logstash_forwarder_spark.operators.fieldops import (
    cidr_match,
    de_dot,
    extract_numbers,
    ipv4_to_long,
    json_encode,
    prune_fields,
    truncate_bytes,
    tld_extract,
    urldecode,
    uuid3_field,
)


def test_prune_whitelist_blacklist(spark):
    df = spark.createDataFrame(
        [(1, "a", 2.0, "x")], "doc_id long, text string, score double, tag string"
    )
    assert prune_fields(df, whitelist=[r"doc_id", r"t.*"]).columns == [
        "doc_id",
        "text",
        "tag",
    ]
    assert prune_fields(df, blacklist=[r"score", r"tag"]).columns == [
        "doc_id",
        "text",
    ]
    # whitelist wins when both given (logstash contract)
    assert prune_fields(
        df, whitelist=[r"text"], blacklist=[r"text"]
    ).columns == ["text"]
    # anchored: "t.*" must not keep a column merely CONTAINING t
    assert "doc_id" not in prune_fields(df, whitelist=[r"t.*"]).columns
    with pytest.raises(ValueError):
        prune_fields(df, whitelist=[r"nope"])
    with pytest.raises(ValueError):
        prune_fields(df)


def test_de_dot_and_collision(spark):
    df = spark.createDataFrame([(1, 2, 3)], "`user.name` long, `user.id` long, ok long")
    assert de_dot(df).columns == ["user_name", "user_id", "ok"]
    bad = spark.createDataFrame([(1, 2)], "`a.b` long, a_b long")
    with pytest.raises(ValueError):
        de_dot(bad)


def test_truncate_bytes_matches_python_utf8(spark):
    rows = ["héllo wörld", "ascii only", "日本語テキスト", "", "éé"]
    df = spark.createDataFrame([(s,) for s in rows], "s string")
    for n in (0, 1, 4, 7, 100):
        got = [
            r.t
            for r in df.select(
                truncate_bytes("s", n).alias("t")
            ).collect()
        ]
        want = [s.encode("utf-8")[:n].decode("utf-8", errors="replace") for s in rows]
        assert got == want, (n, got, want)
    with pytest.raises(ValueError):
        truncate_bytes("s", -1)


def test_urldecode_and_numbers(spark):
    df = spark.createDataFrame(
        [("a%20b%2Fc+d%3D1",), ("x -3.5 y 7 z 12.0",)], "s string"
    )
    out = df.select(
        urldecode("s").alias("d"),
        F.array_join(extract_numbers("s"), ",").alias("nums"),
    ).collect()
    assert out[0].d == "a b/c d=1"
    assert out[1].nums == "-3.5,7,12.0"


def test_uuid3_deterministic_and_null_safe(spark):
    df = spark.createDataFrame(
        [(1, "x", None), (1, "x", None), (1, None, "x")],
        "a long, b string, c string",
    )
    got = [r.u for r in df.select(uuid3_field("a", "b", "c").alias("u")).collect()]
    assert got[0] == got[1]          # deterministic
    assert got[0] != got[2]          # (x, NULL) != (NULL, x)
    u = uuid_mod.UUID(got[0])        # RFC 4122 shaped
    assert u.version == 3
    assert got[0].count("-") == 4 and len(got[0]) == 36


def test_json_encode_roundtrip(spark):
    df = spark.createDataFrame([(7, "x y")], "a long, b string")
    enc = json_encode(df, ["a", "b"], "js")
    row = enc.collect()[0]
    assert row.js == '{"a":7,"b":"x y"}'
    back = enc.select(
        F.from_json("js", "a long, b string").alias("o")
    ).select("o.*").collect()[0]
    assert (back.a, back.b) == (7, "x y")


def test_cidr_match_vs_ipaddress_module(spark):
    cidrs = ["10.0.0.0/24", "10.0.0.0/16", "192.168.1.128/25", "0.0.0.0/0"]
    ips = [
        "10.0.0.5",
        "10.0.1.5",
        "10.1.0.1",
        "192.168.1.200",
        "192.168.1.5",
        "8.8.8.8",
        "255.255.255.255",
    ]
    df = spark.createDataFrame([(ip,) for ip in ips], "ip string")
    got = {
        r.ip: r.m
        for r in df.select("ip", cidr_match("ip", cidrs).alias("m")).collect()
    }
    nets = [(c, ipaddress.ip_network(c)) for c in cidrs]
    for ip in ips:
        want = next(
            (c for c, n in nets if ipaddress.ip_address(ip) in n), None
        )
        assert got[ip] == want, ip
    # ip conversion itself
    longs = {
        r.ip: r.v
        for r in df.select("ip", ipv4_to_long("ip").alias("v")).collect()
    }
    for ip in ips:
        assert longs[ip] == int(ipaddress.ip_address(ip))
    with pytest.raises(ValueError):
        cidr_match("ip", [])
    with pytest.raises(ValueError):
        cidr_match("ip", ["10.0.0.0/40"])


def test_tld_extract_cases(spark):
    cases = {
        "www.example.co.uk": ("co.uk", "example.co.uk", "www"),
        "a.b.example.com": ("com", "example.com", "a.b"),
        "example.org": ("org", "example.org", ""),
        "deep.sub.host.com.au": ("com.au", "host.com.au", "deep.sub"),
        "localhost": ("localhost", "localhost", ""),
    }
    df = spark.createDataFrame([(h,) for h in cases], "host string")
    cols = tld_extract("host")
    got = {
        r.host: (r.tld, r.domain, r.subdomain)
        for r in df.select(
            "host", *[c.alias(k) for k, c in cols.items()]
        ).collect()
    }
    assert got == cases


def test_hygiene_chain_is_shuffle_free(spark):
    """The composed chain (urldecode + truncate + numbers + uuid + json
    + cidr + tld) stays one Project over the scan: no Exchange node."""
    df = spark.createDataFrame(
        [("a%20b", "10.0.0.1", "www.x.co.uk", 1)],
        "s string, ip string, host string, doc_id long",
    )
    tcols = tld_extract("host")
    out = json_encode(
        df.select(
            "doc_id",
            urldecode("s").alias("d"),
            truncate_bytes("s", 4).alias("t"),
            F.array_join(extract_numbers("s"), ",").alias("nums"),
            uuid3_field("doc_id", "s").alias("uid"),
            cidr_match("ip", ["10.0.0.0/8"]).alias("net"),
            *[c.alias(k) for k, c in tcols.items()],
        ),
        ["doc_id", "d"],
        "js",
    )
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_fieldops_randomized_sweep(spark):
    """Randomized batch sweep (one DataFrame per operator, one collect):
    truncate_bytes vs Python UTF-8 byte slicing over random unicode,
    cidr_match vs the ipaddress module over random IPs x a random block
    list, tld_extract vs a pure-Python reference over random hosts."""
    import random

    rng = random.Random(20240817)

    # --- truncate: random unicode (ascii/latin/cjk/emoji mix) x lengths
    alphabet = "ab céü日本語\U0001f600ı"
    strs = [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 12)))
        for _ in range(150)
    ]
    lens = [rng.randrange(0, 16) for _ in strs]
    # truncate_bytes takes a literal length: run once per distinct n
    for n in sorted(set(lens)):
        sub = [s for s, ln in zip(strs, lens) if ln == n]
        got = [
            r.t
            for r in spark.createDataFrame([(s,) for s in sub], "s string")
            .select(truncate_bytes("s", n).alias("t"))
            .collect()
        ]
        want = [s.encode("utf-8")[:n].decode("utf-8", "replace") for s in sub]
        assert got == want, n

    # --- cidr: random ips vs random block list
    cidrs = sorted(
        {
            f"{rng.randrange(256)}.{rng.randrange(256)}.0.0/{rng.choice([8, 12, 16, 20, 24, 32])}"
            for _ in range(12)
        }
    )
    ips = [
        f"{rng.randrange(256)}.{rng.randrange(256)}.{rng.randrange(256)}.{rng.randrange(256)}"
        for _ in range(200)
    ]
    got = {
        r.ip: r.m
        for r in spark.createDataFrame([(ip,) for ip in ips], "ip string")
        .select("ip", cidr_match("ip", cidrs).alias("m"))
        .collect()
    }
    # strict=False: cidr_match's prefix compare masks host bits, the
    # same semantics ip_network(strict=False) applies
    nets = [(c, ipaddress.ip_network(c, strict=False)) for c in cidrs]
    for ip in ips:
        want = next((c for c, n in nets if ipaddress.ip_address(ip) in n), None)
        assert got[ip] == want, ip

    # --- tld: random hosts vs a python reference over the same registry
    from logstash_forwarder_spark.operators.fieldops import _TWO_LEVEL_SUFFIXES

    def py_tld(host):
        labels = host.split(".")
        last2 = ".".join(labels[-2:])
        if len(labels) >= 2 and last2 in _TWO_LEVEL_SUFFIXES:
            tld, nd = last2, 3
        else:
            tld, nd = labels[-1], 2
        domain = ".".join(labels[-nd:]) if len(labels) >= nd else host
        sub = ".".join(labels[:-nd]) if len(labels) > nd else ""
        return tld, domain, sub

    suffixes = list(_TWO_LEVEL_SUFFIXES) + ["com", "org", "io", "net", "uk"]
    hosts = list(
        {
            ".".join(
                ["".join(rng.choice("abcz0") for _ in range(rng.randrange(1, 4)))
                 for _ in range(rng.randrange(0, 3))]
                + [rng.choice(suffixes)]
            ).lstrip(".")
            for _ in range(200)
        }
    )
    cols = tld_extract("host")
    got = {
        r.host: (r.tld, r.domain, r.subdomain)
        for r in spark.createDataFrame([(h,) for h in hosts], "host string")
        .select("host", *[c.alias(k) for k, c in cols.items()])
        .collect()
    }
    for h in hosts:
        assert got[h] == py_tld(h), h


def test_urldecode_malformed_yields_null(spark):
    """A stray % in a raw log field must degrade to NULL (the
    _urldecodefailure analog), never kill the job."""
    df = spark.createDataFrame(
        [("disk at 95% full",), ("trunc%E",), ("ok%20fine",)], "s string"
    )
    got = [r.d for r in df.select(urldecode("s").alias("d")).collect()]
    assert got == [None, None, "ok fine"]


def test_json_encode_renders_nulls(spark):
    """NULL fields render as "k":null (logstash serializes null;
    vanishing keys would break oracle portability over nullables)."""
    df = spark.createDataFrame([(7, None)], "a long, b string")
    row = json_encode(df, ["a", "b"], "js").collect()[0]
    assert row.js == '{"a":7,"b":null}'
