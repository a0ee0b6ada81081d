"""Spark 4 Python DataSource tests: the `newsfeed` format."""

from __future__ import annotations

import json

import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def feed_dirs(tmp_path_factory):
    base = tmp_path_factory.mktemp("feeds")
    na = base / "newsapi"
    na.mkdir()
    (na / "q0.json").write_text(
        json.dumps(
            {
                "status": "ok",
                "articles": [
                    {"title": "A", "url": "u/a", "source": {"id": "nytimes"}},
                    {"title": "B", "url": "u/b", "source": {"id": "bbc"}},
                ],
            }
        )
    )
    (na / "q1.json").write_text(json.dumps({"status": "error", "articles": []}))
    (na / "q2.json").write_text(
        json.dumps(
            {"status": "ok", "articles": [{"title": "C", "url": "u/c", "source": {"id": "cnn"}}]}
        )
    )
    rd = base / "reddit"
    rd.mkdir()
    (rd / "r0.json").write_text(
        json.dumps(
            {
                "data": {
                    "children": [
                        {"data": {"title": "R1", "url": "u1", "domain": "mobile.nytimes.com"}},
                        {"data": {"title": "R2", "url": "u2", "domain": "npr.org"}},
                    ]
                }
            }
        )
    )
    return str(na), str(rd)


@pytest.fixture(scope="module")
def registered(spark):
    from data_pipeline_playground_spark.sources.newsfeed_datasource import (
        NewsfeedDataSource,
    )

    spark.dataSource.register(NewsfeedDataSource)
    return spark


def test_newsapi_format(registered, feed_dirs):
    na_dir, _ = feed_dirs
    df = registered.read.format("newsfeed").option("path", na_dir).load()
    rows = df.collect()
    # q1 (status=error) contributes nothing; q0+q2 → 3 articles
    assert {(r.title, r.source) for r in rows} == {
        ("A", "nytimes"), ("B", "bbc"), ("C", "cnn"),
    }
    # one partition per response file → parallel fan-out (R1)
    assert df.rdd.getNumPartitions() == 3


def test_reddit_format_domain_parse(registered, feed_dirs):
    _, rd_dir = feed_dirs
    df = (
        registered.read.format("newsfeed")
        .option("path", rd_dir)
        .option("kind", "reddit")
        .load()
    )
    src = {r.title: r.source for r in df.collect()}
    assert src == {"R1": "nytimes", "R2": "npr"}


def test_newsfeed_composes_with_engine_ops(registered, feed_dirs):
    """The format is a normal DataFrame source: dedup + group works."""
    na_dir, _ = feed_dirs
    df = registered.read.format("newsfeed").option("path", na_dir).load()
    out = (
        df.filter(F.col("source").isNotNull())
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert out.count() == 3
