"""Fixture-backed HTTP source connectors (reference S2-S5).

The reference fans out live HTTP requests (NewsAPI realtimeapi.py:29-47,
Reddit reddit.py:26-43, MediaWiki wikipedia.py:1-42, article fetch
realtimeapi.py:50-82). An analytics engine cannot depend on live
network in tests, so each connector reads a *recorded response* (JSON
fixture) through the same response-shape schema, and the query
construction / flattening / null-propagation logic — the actual
dataflow — is identical. A live `requests`-based fetch can plug into
``fetch_fn`` without touching any downstream operator.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# --- response-shape schemas (FIXTURES.md F3-F6) -----------------------------

NEWSAPI_SCHEMA = T.StructType(
    [
        T.StructField("status", T.StringType()),
        T.StructField(
            "articles",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("title", T.StringType()),
                        T.StructField("url", T.StringType()),
                        T.StructField(
                            "source",
                            T.StructType([T.StructField("id", T.StringType())]),
                        ),
                    ]
                )
            ),
        ),
    ]
)

REDDIT_SCHEMA = T.StructType(
    [
        T.StructField(
            "data",
            T.StructType(
                [
                    T.StructField(
                        "children",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField(
                                        "data",
                                        T.StructType(
                                            [
                                                T.StructField("title", T.StringType()),
                                                T.StructField("url", T.StringType()),
                                                T.StructField("domain", T.StringType()),
                                            ]
                                        ),
                                    )
                                ]
                            )
                        ),
                    )
                ]
            ),
        )
    ]
)

WIKI_SECTIONS_SCHEMA = T.StructType(
    [
        T.StructField(
            "parse",
            T.StructType(
                [
                    T.StructField("title", T.StringType()),
                    T.StructField(
                        "sections",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField("line", T.StringType()),
                                    T.StructField("toclevel", T.IntegerType()),
                                ]
                            )
                        ),
                    ),
                ]
            ),
        )
    ]
)


# --- query construction (pure expressions; S2/S3) ---------------------------


def newsapi_query_params(page: str, section: str) -> dict[str, str]:
    """NewsAPI query dict (reference realtimeapi.py:29-47): quoted
    '"page" +"section"' q-string and a [today-2w, today] date window —
    the window is computed by the caller's engine (M1 date_window)."""
    return {
        "q": f'"{page}" +"{section}"',
        "language": "en",
        "sortBy": "relevancy",
        "pageSize": "5",
    }


def reddit_search_query(sites: list[str], subject: str, topic: str | None = None) -> str:
    """Reddit search string (reference reddit.py:26-43): site whitelist
    OR-chain AND subject [AND topic]."""
    site_expr = "(site:" + " OR site:".join(sites) + ")"
    parts = [site_expr, subject] + ([topic] if topic else [])
    return " AND ".join(parts)


# --- fixture-backed readers -------------------------------------------------


def read_newsapi(spark: SparkSession, fixture_path: str) -> DataFrame:
    """NewsAPI response → article rows; non-'ok' statuses are dropped
    (reference raises at realtimeapi.py:45-46 — here: filtered, the
    null-propagating analogue)."""
    raw = spark.read.schema(NEWSAPI_SCHEMA).option("multiLine", True).json(fixture_path)
    return (
        raw.filter(F.col("status") == "ok")
        .select(F.explode("articles").alias("a"))
        .select(
            F.col("a.title").alias("title"),
            F.col("a.url").alias("url"),
            F.col("a.source.id").alias("source"),
        )
    )


def read_reddit(spark: SparkSession, fixture_path: str) -> DataFrame:
    """Reddit listing → article rows with P5 domain→source extraction
    (reference reddit.py:43-58: mobile.nytimes.com → nytimes)."""
    raw = spark.read.schema(REDDIT_SCHEMA).option("multiLine", True).json(fixture_path)
    return (
        raw.select(F.explode("data.children").alias("c"))
        .select(
            F.col("c.data.title").alias("title"),
            F.col("c.data.url").alias("url"),
            F.element_at(F.split("c.data.domain", "\\."), -2).alias("source"),
        )
    )


def read_wiki_sections(spark: SparkSession, fixture_path: str) -> DataFrame:
    """MediaWiki parse-sections response → (page_title, line, toclevel)
    rows (reference wikipedia.py:35-42 + realtimeapi.py:119-123)."""
    raw = spark.read.schema(WIKI_SECTIONS_SCHEMA).option("multiLine", True).json(
        fixture_path
    )
    return raw.select(
        F.col("parse.title").alias("page_title"),
        F.explode("parse.sections").alias("s"),
    ).select("page_title", F.col("s.line").alias("line"), F.col("s.toclevel").alias("toclevel"))


RESERVED_HEADINGS = (
    "External links",
    "References",
    "Bibliography",
    "Notes",
    "See also",
)
NUM_QUERIES = 10


def rank_sections(sections: DataFrame) -> DataFrame:
    """T2 heuristic_rank_topk (reference query_heuristic,
    realtimeapi.py:85-95,125-130): demote reserved headings, top-10."""
    return (
        sections.withColumn(
            "score",
            F.when(F.col("line").isin(*RESERVED_HEADINGS), 0).otherwise(1),
        )
        .orderBy(F.desc("score"), F.desc("toclevel"), F.asc("line"))
        .limit(NUM_QUERIES)
    )


# --- HTML fetch + CSS extract (S5/S6), fetch_fn-pluggable -------------------

FetchFn = Callable[[str], str | None]


def fetch_and_extract(
    articles: DataFrame,
    parser_registry: dict[str, str],
    fetch_fn: FetchFn | None = None,
) -> DataFrame:
    """S5 html_fetch + S6 css_extract + J4 dict_lookup_join.

    ``fetch_fn(url) -> html | None`` runs inside an Arrow-batched
    mapInPandas (the reference's asyncio fan-out becomes executor task
    parallelism, R1); a registry miss or fetch failure yields a NULL
    text row, exactly like reference reddit_api.py:40-48. Without a
    fetch_fn the text column is NULL for every row (offline mode).

    ``parser_registry`` maps source id → CSS selector (reference
    news_parsers.py:16-51). Extraction uses the stdlib selector engine
    in sources/css_select.py with the reference's exactly-one-match-
    else-null semantics (gen_parser, news_parsers.py:1-13): zero or
    multiple selector matches yield a NULL text row.
    """
    import pandas as pd  # noqa: F401 — required for mapInPandas

    from data_pipeline_playground_spark.sources.css_select import extract_one

    registry = dict(parser_registry)
    fetch = fetch_fn

    def _extract(batches):
        for pdf in batches:
            texts = []
            for url, source in zip(pdf["url"], pdf["source"]):
                html = None
                if fetch is not None and source in registry and url:
                    try:
                        html = fetch(url)
                    except Exception:
                        html = None  # 4xx/error → null row (S5)
                if html is None:
                    texts.append(None)
                else:
                    texts.append(extract_one(html, registry[source]))
            pdf = pdf.assign(text=texts)
            yield pdf

    out_schema = ", ".join(
        f"{name} {dtype}" for name, dtype in articles.dtypes
    ) + ", text string"
    return articles.mapInPandas(_extract, schema=out_schema)


WIKI_PAGE_SCHEMA = T.StructType(
    [
        T.StructField("pageid", T.LongType()),
        T.StructField("title", T.StringType()),
        T.StructField("extract", T.StringType()),
        T.StructField(
            "original", T.StructType([T.StructField("source", T.StringType())])
        ),
        T.StructField(
            "thumbnail", T.StructType([T.StructField("source", T.StringType())])
        ),
    ]
)


def read_wiki_page_summary(spark: SparkSession, fixture_path: str) -> DataFrame:
    """Wikipedia intro/extract endpoint (reference GET /wikipedia,
    realtimeapi.py:172-197): {found, title, summary, image} rows with
    the image fallback chain original.source → thumbnail.source → null
    (realtimeapi.py:185-191) expressed as coalesce."""
    raw = spark.read.schema(WIKI_PAGE_SCHEMA).option("multiLine", True).json(
        fixture_path
    )
    return raw.select(
        F.col("pageid").isNotNull().alias("found"),
        "title",
        F.col("extract").alias("summary"),
        F.coalesce(F.col("original.source"), F.col("thumbnail.source")).alias("image"),
    )
