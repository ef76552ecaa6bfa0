"""URL canonicalization operator (operators/urls.py) — contract pins.

All pure Column expressions; the plan test asserts the operator stays
JVM-side (no Python evaluation node).
"""

import pytest
from pyspark.sql import functions as F

from html_parser_spark.operators.urls import (
    host_of, normalize_url, registered_domain, with_url_columns,
)


def norm(spark, *urls):
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    return [r[0] for r in df.select(normalize_url(F.col("url"))).collect()]


def test_scheme_and_host_lowercased(spark):
    assert norm(spark, "HTTPS://Ex.COM/p") == ["https://ex.com/p"]


def test_default_ports_stripped_other_ports_kept(spark):
    assert norm(
        spark,
        "https://a.com:443/x",
        "http://a.com:80/x",
        "https://a.com:8443/x",
        "http://a.com:8080/x",
    ) == [
        "https://a.com/x",
        "http://a.com/x",
        "https://a.com:8443/x",
        "http://a.com:8080/x",
    ]


def test_empty_path_becomes_slash_and_fragment_dropped(spark):
    assert norm(spark, "https://a.com", "https://a.com/p#sec") == [
        "https://a.com/",
        "https://a.com/p",
    ]


def test_tracking_params_dropped_order_preserved(spark):
    assert norm(
        spark,
        "https://a.com/p?utm_source=x&b=2&utm_campaign=y&a=1&fbclid=z",
        "https://a.com/p?utm_source=x",
        "https://a.com/p?b=2&a=1",
    ) == [
        "https://a.com/p?b=2&a=1",   # order kept, trackers gone
        "https://a.com/p",           # emptied query drops its '?'
        "https://a.com/p?b=2&a=1",   # no resort
    ]


def test_utm_prefix_is_param_name_anchored(spark):
    # a param VALUE containing 'utm_' or a name merely containing it
    # ('autm_x') must survive
    assert norm(spark, "https://a.com/p?q=utm_source&autm_x=1") == [
        "https://a.com/p?q=utm_source&autm_x=1"
    ]


def test_host_and_registered_domain(spark):
    df = spark.createDataFrame(
        [("https://News.Sub.Example.COM:8443/x?a=1",)], ["url"])
    row = df.select(
        host_of(F.col("url")).alias("h"),
        registered_domain(host_of(F.col("url"))).alias("d"),
    ).collect()[0]
    assert row.h == "news.sub.example.com"
    assert row.d == "example.com"


def test_with_url_columns_triple(spark):
    df = spark.createDataFrame(
        [("u1", "HTTP://A.Example.com:80/d?utm_medium=m&k=v#f")],
        ["id", "url"])
    row = with_url_columns(df).collect()[0]
    assert row.url_norm == "http://a.example.com/d?k=v"
    assert row.host == "a.example.com"
    assert row.domain == "example.com"


def test_plan_stays_jvm_side(spark):
    df = spark.createDataFrame([("https://a.com/p?x=1",)], ["url"])
    plan = with_url_columns(df)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan  # no BatchEvalPython / ArrowEvalPython


def test_url_dedup_shape(spark):
    # the intended composition: canonical key -> exact dedup
    df = spark.createDataFrame(
        [(1, "https://a.com/p?utm_source=x"),
         (2, "HTTPS://A.COM:443/p"),
         (3, "https://a.com/q")], ["id", "url"])
    kept = (with_url_columns(df)
            .groupBy("url_norm").agg(F.min("id").alias("keep_id")))
    assert sorted((r.url_norm, r.keep_id) for r in kept.collect()) == [
        ("https://a.com/p", 1), ("https://a.com/q", 3)]


# ---------------------------------------------------------------------------
# RFC 3986 reference resolution (resolve_url)
# ---------------------------------------------------------------------------

_BASES = [
    "http://h/a/b/c",
    "http://h/a/b/c?q=2",
    "http://h/a/b/",
    "http://h/",
    "http://h",
    "https://H.ex.com:8080/a/b/page.html?x=1",
]

_REFS = [
    "", "#f", "?y=3", "d", "d/e", "./d", "../d", "../../d", "../../../d",
    "/d", "/d/../e", "/..", "//other/p", "https://abs.example/x#f",
    "mailto:someone@example.com", "d/./e/../f", "..", ".",
    "d?y=4#z", "d/", "../",
]


def test_resolve_url_matches_urljoin_matrix(spark):
    """Pin the resolver against the stdlib's RFC 3986 implementation
    (fragments stripped on both sides — frontier contract).  120+
    (base, ref) combinations covering merge, dot-segment removal,
    root clamping, scheme/authority/query inheritance and
    non-hierarchical pass-through."""
    from urllib.parse import urljoin

    from html_parser_spark.operators.urls import resolve_url

    cases = [(b, r) for b in _BASES for r in _REFS]
    df = spark.createDataFrame(cases, ["base", "ref"])
    got = [r[0] for r in
           df.select(resolve_url(F.col("base"), F.col("ref"))).collect()]
    for (b, r), g in zip(cases, got):
        want = urljoin(b, r).split("#")[0]
        assert g == want, f"resolve({b!r}, {r!r}) = {g!r}, urljoin says {want!r}"


def test_resolve_url_keeps_empty_segments_rfc_not_cpython(spark):
    """RFC 3986 §5.2.4 removes only '.'/'..' — '//' inside a path
    survives (WHATWG agrees).  CPython's urljoin collapses interior
    empty segments of RELATIVE refs ('d//e' → 'd/e'), a documented
    stdlib quirk we do NOT follow; for absolute-path refs urljoin
    itself keeps them, and we match."""
    from html_parser_spark.operators.urls import resolve_url

    df = spark.createDataFrame(
        [("http://h/a/b/c", "d//e"), ("http://h/a/b/c", "/d//e")],
        ["base", "ref"])
    got = [r[0] for r in
           df.select(resolve_url(F.col("base"), F.col("ref"))).collect()]
    assert got == ["http://h/a/b/d//e", "http://h/d//e"]


def test_resolve_url_cleans_network_path_refs(spark):
    """RFC 3986 §5.2.2: a ref WITH an authority (network-path '//h/p'
    or full scheme) still gets remove_dot_segments on its path.
    CPython's urljoin skips removal outside the relative-merge branch
    — second documented stdlib divergence; we follow the RFC."""
    from html_parser_spark.operators.urls import resolve_url

    df = spark.createDataFrame(
        [("http://h/x", "//h2/a/./b/../c"),
         ("http://h/x", "https://abs.example/a/../b")],
        ["base", "ref"])
    got = [r[0] for r in
           df.select(resolve_url(F.col("base"), F.col("ref"))).collect()]
    assert got == ["http://h2/a/c", "https://abs.example/b"]


def test_resolve_url_plan_stays_jvm_side(spark):
    from html_parser_spark.operators.urls import resolve_url

    df = spark.createDataFrame([("http://h/a/", "../x")], ["base", "ref"])
    plan = (df.select(resolve_url(F.col("base"), F.col("ref")))
            ._jdf.queryExecution().executedPlan().toString())
    assert "Python" not in plan


def test_resolve_url_null_propagates(spark):
    from html_parser_spark.operators.urls import resolve_url

    df = spark.createDataFrame(
        [(None, "x"), ("http://h/", None)], ["base", "ref"])
    got = [r[0] for r in
           df.select(resolve_url(F.col("base"), F.col("ref"))).collect()]
    assert got == [None, None]


def test_resolve_url_randomized_matrix_vs_urljoin(spark):
    """400 seeded pseudo-random (base, ref) pairs — one Spark job —
    against urllib.parse.urljoin.  Refs avoid interior empty segments
    in relative paths (the single documented CPython-vs-RFC
    divergence, pinned separately above)."""
    import random
    from urllib.parse import urljoin

    from html_parser_spark.operators.urls import resolve_url

    rng = random.Random(20260818)
    seg_pool = ["a", "bb", "ccc", ".", "..", "idx.html"]

    def rand_path(absolute, max_segs=4):
        segs = [rng.choice(seg_pool) for _ in range(rng.randint(1, max_segs))]
        p = "/".join(segs)
        if absolute:
            p = "/" + p
        if rng.random() < 0.3:
            p += "/"
        return p

    cases = []
    for _ in range(400):
        bq = "?b=1" if rng.random() < 0.4 else ""
        base = "http://host" + rand_path(True) + bq
        kind = rng.randrange(5)
        if kind == 0:
            ref = rand_path(False)
        elif kind == 1:
            ref = rand_path(True)
        elif kind == 2:
            ref = rand_path(False) + "?q=" + str(rng.randrange(9))
        elif kind == 3:
            # network-path refs get dot-free paths: CPython skips
            # §5.2.2's remove_dot_segments for them, we follow the RFC
            # (pinned in test_resolve_url_cleans_network_path_refs)
            ref = "//h2/" + "/".join(
                rng.choice(["a", "bb", "ccc"])
                for _ in range(rng.randint(1, 3)))
        else:
            ref = rng.choice(["", "?z=9", "#frag", "."])
        cases.append((base, ref))

    df = spark.createDataFrame(cases, ["base", "ref"])
    got = [r[0] for r in
           df.select(resolve_url(F.col("base"), F.col("ref"))).collect()]
    bad = [(b, r, g, urljoin(b, r).split("#")[0])
           for (b, r), g in zip(cases, got)
           if g != urljoin(b, r).split("#")[0]]
    assert not bad, f"{len(bad)} mismatches, first: {bad[0]}"


def test_userinfo_dropped_by_normalize_kept_by_resolve(spark):
    """Canonicalization is a dedup key — credentials must not leak
    into accounting tables (userinfo dropped); resolution is faithful
    (base authority kept verbatim)."""
    from html_parser_spark.operators.urls import resolve_url

    df = spark.createDataFrame(
        [("https://user:pw@Ex.COM:443/p?a=1#f",)], ["url"])
    assert [r[0] for r in
            df.select(normalize_url(F.col("url"))).collect()] == [
        "https://ex.com/p?a=1"]
    d2 = spark.createDataFrame([("http://user@h/a/b", "../c")],
                               ["base", "ref"])
    assert [r[0] for r in
            d2.select(resolve_url(F.col("base"), F.col("ref"))).collect()] == [
        "http://user@h/c"]
