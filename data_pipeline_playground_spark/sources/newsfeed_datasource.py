"""`newsfeed` — a Spark 4 Python DataSource for the reference's HTTP
article sources (SURVEY S2/S3: NewsAPI realtimeapi.py:29-47, Reddit
reddit.py:26-43), fixture-backed.

Register once per session, then it is a first-class format:

    spark.dataSource.register(NewsfeedDataSource)
    df = (spark.read.format("newsfeed")
          .option("path", "/fixtures/dir")     # dir of recorded responses
          .option("kind", "newsapi")           # or "reddit"
          .load())

Each recorded response file becomes one input partition, so a fan-out
of N queries (the reference's asyncio loop, R1) reads as N parallel
partitions. A live-HTTP variant only needs `_rows_from_payload` fed by
a fetch instead of a file — the planner/partition surface is identical.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

SCHEMA_DDL = "title string, url string, source string, query_file string"


class NewsfeedDataSource(DataSource):
    """Article-feed data source over recorded NewsAPI/Reddit responses."""

    @classmethod
    def name(cls) -> str:
        return "newsfeed"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema: StructType) -> "NewsfeedReader":
        return NewsfeedReader(self.options)


class _FilePartition(InputPartition):
    def __init__(self, path: str, kind: str):
        self.path = path
        self.kind = kind


class NewsfeedReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        self.kind = options.get("kind", "newsapi")
        if not self.path:
            raise ValueError("newsfeed source requires .option('path', dir)")
        if self.kind not in ("newsapi", "reddit"):
            raise ValueError(f"unknown kind {self.kind!r}")

    def partitions(self):
        files = sorted(
            f for f in os.listdir(self.path) if f.endswith(".json")
        )
        return [
            _FilePartition(os.path.join(self.path, f), self.kind) for f in files
        ]

    def read(self, partition: _FilePartition):
        with open(partition.path) as fh:
            payload = json.load(fh)
        fname = os.path.basename(partition.path)
        yield from _rows_from_payload(payload, partition.kind, fname)


def _rows_from_payload(payload: dict, kind: str, query_file: str):
    """Response JSON → (title, url, source, query_file) tuples.

    newsapi: non-'ok' statuses are skipped (reference raises,
    realtimeapi.py:45-46 — here the whole response yields no rows);
    reddit: source = second-to-last domain part (reddit.py:50-53).
    """
    if kind == "newsapi":
        if payload.get("status") != "ok":
            return
        for a in payload.get("articles") or []:
            src = (a.get("source") or {}).get("id")
            yield (a.get("title"), a.get("url"), src, query_file)
    else:
        children = ((payload.get("data") or {}).get("children")) or []
        for c in children:
            d = c.get("data") or {}
            domain_parts = (d.get("domain") or "").split(".")
            src = domain_parts[-2] if len(domain_parts) >= 2 else None
            yield (d.get("title"), d.get("url"), src, query_file)


# DataSource classes are pickled to executor Python workers; ship this
# module by value (see functions/nlp_udfs.py — the repo package may not
# be importable on workers when the driver runs from another cwd).
import sys as _sys

from pyspark.cloudpickle import register_pickle_by_value as _by_value

_by_value(_sys.modules[__name__])
