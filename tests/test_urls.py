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
