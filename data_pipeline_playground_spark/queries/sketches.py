"""Count–min sketch heavy hitters (SURVEY §2.12 sketch family).

The approx-distinct / approx-quantile certificates live in
queries/analytics.py; this module adds the third classic streaming
sketch — a count–min sketch over the corpus term stream — built the
way a 1000-executor run would build it: the D×W counter table is a
map-side-combined groupBy over (depth, bucket) fan-out rows, so every
executor contributes partial counters and the final table is D·W rows
regardless of corpus size, then broadcasts to probe candidates.

Both engines derive bucket ids from the portable rolling hash, so the
sketch counters — and therefore the estimates — are bit-identical in
DuckDB: the oracle checks the ESTIMATES exactly, not just a bound.
The CMS overestimate guarantee (est ≥ exact, always) is still emitted
as a certificate column both engines compute.

Reference parity: the reference counts term frequencies exactly in a
dict (cluster.py TF-IDF build); the sketch is the bounded-memory
generalization a 100 TB vocabulary needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_pipeline_playground_spark.functions.text import (
    rolling_hash,
    sql_rolling_hash,
)
from data_pipeline_playground_spark.registry import query
from data_pipeline_playground_spark.tables import table

CMS_DEPTH = 4
CMS_WIDTH = 1024
TOP_K = 20

_TOK = "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> t <> '')"


def _sql_bucket(term_expr: str, d_expr: str) -> str:
    key = f"CAST({d_expr} AS VARCHAR) || ':' || {term_expr}"
    return f"({sql_rolling_hash(key)}) % {CMS_WIDTH}"


_CMS_SQL = f"""
WITH tok AS (SELECT unnest({_TOK}) AS term FROM documents),
depths AS (SELECT unnest(range(0, {CMS_DEPTH})) AS d),
cms AS (
  SELECT d, {_sql_bucket('term', 'd')} AS bucket, COUNT(*) AS c
  FROM tok CROSS JOIN depths GROUP BY d, bucket
),
exact AS (SELECT term, COUNT(*) AS exact_cnt FROM tok GROUP BY term),
cand AS (SELECT term, exact_cnt FROM exact
         ORDER BY exact_cnt DESC, term LIMIT {TOP_K}),
probe AS (
  SELECT cand.term, cand.exact_cnt, cms.c
  FROM cand CROSS JOIN depths
  JOIN cms ON cms.d = depths.d
          AND cms.bucket = {_sql_bucket('cand.term', 'depths.d')}
)
SELECT term, exact_cnt, CAST(MIN(c) AS BIGINT) AS cms_est,
       MIN(c) >= exact_cnt AS est_ge_exact
FROM probe GROUP BY term, exact_cnt
"""


def _buckets(term: F.Column) -> F.Column:
    """array<struct<d, bucket>> of the CMS_DEPTH bucket ids of a term."""
    return F.array(
        *[
            F.struct(
                F.lit(d).alias("d"),
                (
                    rolling_hash(F.concat(F.lit(f"{d}:"), term)) % CMS_WIDTH
                ).alias("bucket"),
            )
            for d in range(CMS_DEPTH)
        ]
    )


@query("heavy_hitters_cms", oracle=_CMS_SQL)
def heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K corpus terms with their count–min-sketch estimates and
    the overestimate certificate (cms_est ≥ exact_cnt, deterministic).

    Plan shape (round 14, guide §2.3 "aggregate before you shuffle"):
    ONE explode of the token stream into ONE (term → exact count)
    aggregate — the corpus is tokenized exactly once — and the CMS
    counter table is then derived from the vocabulary-sized count
    frame as a WEIGHTED sum (SUM(exact_cnt) per bucket ≡ COUNT(*) over
    the fan-out rows: integer addition reassociates exactly, so every
    counter — and every estimate — is bit-identical to the per-token
    build the oracle runs). The old shape tokenized the corpus twice
    (once per aggregate) and hashed DEPTH× per token OCCURRENCE; this
    hashes DEPTH× per DISTINCT term. The counter table still collapses
    to DEPTH×WIDTH rows and broadcasts to the probe join. At 100 TB
    the exact-count pass is the only full-corpus pass; the CMS build
    is vocabulary-sized work on top of it.
    """
    from data_pipeline_playground_spark.functions.text import tokenize

    docs = table(spark, sf_dir, "documents")
    tok = docs.select(F.explode(tokenize(F.col("text"))).alias("term"))
    # The CMS branch and the candidate branch both read this frame;
    # the static plan shows two tokenize subtrees but the EXECUTED
    # plan deduplicates them through ReusedExchange — r15 measured the
    # eager-materialization alternative (cache+count) at +0.4 s per
    # run for insurance the runtime already provides, so the reuse is
    # pinned by tests/test_plans.py::test_cms_exact_exchange_reused
    # instead (VERDICT r14 #4's second option).
    exact = tok.groupBy("term").agg(F.count(F.lit(1)).alias("exact_cnt"))
    cms = (
        exact.select(
            F.explode(_buckets(F.col("term"))).alias("db"), "exact_cnt"
        )
        .select("db.d", "db.bucket", "exact_cnt")
        .groupBy("d", "bucket")
        .agg(F.sum("exact_cnt").alias("c"))
    )
    cand = exact.orderBy(F.col("exact_cnt").desc(), "term").limit(TOP_K)
    probe = cand.select(
        "term", "exact_cnt", F.explode(_buckets(F.col("term"))).alias("db")
    ).select("term", "exact_cnt", "db.d", "db.bucket")
    return (
        probe.join(F.broadcast(cms), ["d", "bucket"])
        .groupBy("term", "exact_cnt")
        .agg(
            F.min("c").cast("long").alias("cms_est"),
            (F.min("c") >= F.col("exact_cnt")).alias("est_ge_exact"),
        )
    )


# ---- Bloom-filter blocklist membership -------------------------------------

BLOOM_M = 4096   # bits
BLOOM_K = 3      # hash functions
BLOCK_MAX_ID = 5  # doc_id < 5 stands in for the external blocklist corpus

def _sql_block_shingles() -> str:
    from data_pipeline_playground_spark.queries.sampling import _decon_shingles
    from data_pipeline_playground_spark.operators.minhash import SHINGLE_N

    return _decon_shingles(SHINGLE_N)


def _sql_bloom_bucket(k_expr: str, g_expr: str) -> str:
    key = f"CAST({k_expr} AS VARCHAR) || ':' || {g_expr}"
    return f"({sql_rolling_hash(key)}) % {BLOOM_M}"


def _build_bloom_sql() -> str:
    sh = _sql_block_shingles()
    return f"""
WITH ex AS (SELECT doc_id, unnest({sh}) AS g FROM documents),
block AS (SELECT DISTINCT g FROM ex WHERE doc_id < {BLOCK_MAX_ID}),
ks AS (SELECT unnest(range(0, {BLOOM_K})) AS k),
bits AS (SELECT DISTINCT {_sql_bloom_bucket('k', 'g')} AS bit
         FROM block CROSS JOIN ks),
probe AS (SELECT doc_id, g FROM ex WHERE doc_id >= {BLOCK_MAX_ID}),
pb AS (
  SELECT probe.doc_id, probe.g, COUNT(*) AS nbits
  FROM probe CROSS JOIN ks
  JOIN bits ON bits.bit = {_sql_bloom_bucket('ks.k', 'probe.g')}
  GROUP BY probe.doc_id, probe.g
),
bh AS (SELECT doc_id, COUNT(CASE WHEN nbits = {BLOOM_K} THEN 1 END) AS bloom_hits
       FROM pb GROUP BY doc_id),
exact AS (SELECT probe.doc_id, COUNT(*) AS exact_hits
          FROM probe JOIN block USING (g) GROUP BY probe.doc_id),
base AS (SELECT DISTINCT doc_id FROM probe)
SELECT base.doc_id,
       COALESCE(bh.bloom_hits, 0) AS bloom_hits,
       COALESCE(exact.exact_hits, 0) AS exact_hits,
       COALESCE(bh.bloom_hits, 0) >= COALESCE(exact.exact_hits, 0) AS no_false_neg
FROM base LEFT JOIN bh USING (doc_id) LEFT JOIN exact USING (doc_id)
"""


def _bloom_buckets(g: F.Column) -> F.Column:
    """array<long> of the BLOOM_K bucket ids of a shingle."""
    return F.array(
        *[
            rolling_hash(F.concat(F.lit(f"{k}:"), g)) % BLOOM_M
            for k in range(BLOOM_K)
        ]
    )


@query("bloom_blocklist_hits", oracle=_build_bloom_sql())
def bloom_blocklist_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter blocklist screening: per probe doc, how many of its
    shingles the Bloom filter flags vs. ground truth, plus the
    no-false-negative certificate (Bloom's structural guarantee; false
    positives are expected and measurable as bloom_hits - exact_hits).

    The filter is BLOOM_K portable-hash buckets over BLOOM_M bits built
    from the blocklist corpus (stand-in: doc_id < BLOCK_MAX_ID, as in
    decontaminate_overlap). Plan shape: the bit set is at most BLOOM_M
    integers no matter how large the blocklist — it broadcasts to the
    probe side, so the corpus is screened in one narrow pass plus a
    broadcast join. At 100 TB this is the standard pre-filter in front
    of exact decontamination: the Bloom pass prunes the corpus to
    candidate docs cheaply, and the exact join runs only on those.
    (Here both passes run corpus-wide so the oracle can check the
    false-positive accounting itself.)
    """
    from data_pipeline_playground_spark.queries.sampling import (
        _doc_shingles_memo,
    )

    # four branches read the shingle set (block, probe→pb, probe→exact,
    # base); the shared doc_shingles memo (r15, VERDICT r14 #7) is the
    # same eagerly cached frame decontaminate_overlap and
    # corpus_funnel's contamination gate consume — one shingle build
    # per session instead of one per query.
    ex = _doc_shingles_memo(spark, sf_dir)
    block = ex.filter(F.col("doc_id") < BLOCK_MAX_ID).select("g").distinct()
    bits = block.select(
        F.explode(_bloom_buckets(F.col("g"))).alias("bit")
    ).distinct()
    probe = ex.filter(F.col("doc_id") >= BLOCK_MAX_ID)
    pb = (
        probe.select(
            "doc_id", "g", F.explode(_bloom_buckets(F.col("g"))).alias("bit")
        )
        .join(F.broadcast(bits), "bit")
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("nbits"))
    )
    bh = (
        pb.filter(F.col("nbits") == BLOOM_K)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("bloom_hits"))
    )
    exact = (
        probe.join(F.broadcast(block), "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("exact_hits"))
    )
    base = probe.select("doc_id").distinct()
    return (
        base.join(bh, "doc_id", "left")
        .join(exact, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("bloom_hits", F.lit(0)).alias("bloom_hits"),
            F.coalesce("exact_hits", F.lit(0)).alias("exact_hits"),
            (
                F.coalesce("bloom_hits", F.lit(0))
                >= F.coalesce("exact_hits", F.lit(0))
            ).alias("no_false_neg"),
        )
    )


# --- deterministic bootstrap CI for the median -------------------------------

CI_SAMPLE_N = 400
CI_B = 100  # resamples; CI = 3rd / 98th order stats (~95% percentile CI)
_CI_MULT = 2654435761  # Knuth multiplicative constant
_CI_MOD = 1_000_000_007

_MEDIAN_CI_SQL = f"""
WITH ev AS (
  SELECT event_type, event_id, value,
         ((event_id % {_CI_MOD}) * {_CI_MULT}) % {_CI_MOD} AS h
         -- event_id reduced mod P BEFORE the multiply: the raw
         -- product overflows int64 for event_id ≥ ~3.5e9 (found by
         -- the round-10 events scale probe under ANSI mode); the
         -- reduced form caps it at ~2.65e18 < 2^62 and selects the
         -- SAME sample for any event_id < P
  FROM events WHERE value IS NOT NULL
),
samp AS (
  SELECT event_type, v, idx FROM (
    SELECT event_type, value AS v,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY h, event_id) AS idx
    FROM ev) t
  WHERE idx <= {CI_SAMPLE_N}
),
info AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_sample,
         {sql_rolling_hash("event_type")} AS th
  FROM samp GROUP BY event_type
),
d1 AS (
  SELECT event_type, n_sample, th,
         unnest(generate_series(1, {CI_B})) AS b
  FROM info
),
d2 AS (
  SELECT event_type, n_sample, th, b,
         unnest(generate_series(1, n_sample)) AS i
  FROM d1
),
dr AS (
  SELECT event_type, b, i,
         1 + (((th * 131 + b) % {_CI_MOD}) * 131 + i) % {_CI_MOD} % n_sample
           AS pick
  FROM d2
),
j AS (
  SELECT d.event_type, d.b, d.i, s.v
  FROM dr d JOIN samp s ON s.event_type = d.event_type AND s.idx = d.pick
),
m1 AS (
  SELECT event_type, b, v,
         row_number() OVER (PARTITION BY event_type, b ORDER BY v, i) AS r
  FROM j
),
meds AS (
  SELECT m1.event_type, m1.b, m1.v AS med
  FROM m1 JOIN info USING (event_type)
  WHERE m1.r = (info.n_sample + 1) // 2
),
mr AS (
  SELECT event_type, b, med,
         row_number() OVER (PARTITION BY event_type ORDER BY med, b) AS r
  FROM meds
),
ci AS (
  SELECT event_type,
         max(CASE WHEN r = 3 THEN med END) AS ci_lo,
         max(CASE WHEN r = {CI_B - 2} THEN med END) AS ci_hi
  FROM mr GROUP BY event_type
),
sm AS (
  SELECT event_type, v AS sample_median FROM (
    SELECT s.event_type, s.v,
           row_number() OVER (PARTITION BY s.event_type
                              ORDER BY s.v, s.idx) AS r,
           i.n_sample
    FROM samp s JOIN info i USING (event_type)) t
  WHERE r = (n_sample + 1) // 2
)
SELECT i.event_type, i.n_sample, sm.sample_median, ci.ci_lo, ci.ci_hi
FROM info i JOIN sm USING (event_type) JOIN ci USING (event_type)
"""


@query("event_value_median_ci", oracle=_MEDIAN_CI_SQL)
def event_value_median_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bootstrap ~95% confidence interval for the per-type median
    event value (Efron 1979), fully deterministic: the B = 100
    resamples are indexed by a portable integer hash of
    (type, resample, draw), never an RNG, so both engines — and any
    two cluster runs — materialize the SAME resamples. CI bounds are
    the 3rd and 98th order statistics of the resample medians; every
    output is a SELECTED raw double (order statistics, no
    interpolation), making parity exact by construction.

    Scale: medians bootstrap over a deterministic hash-ordered
    subsample of CI_SAMPLE_N per type (the estimator a 100 TB
    pipeline would actually use), so the draw matrix is
    |types|·B·n — independent of fact size; the sampled frame
    broadcasts into the draw join; per-(type, b) medians are
    window order statistics over ≤ n rows.
    """
    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    # event_id % P first — the raw product overflows int64 for ids
    # ≥ ~3.5e9 under ANSI mode (round-10 events scale probe); same
    # sample for any event_id < P, mirrored in the oracle
    h = (
        F.pmod(F.col("event_id"), F.lit(_CI_MOD)) * F.lit(_CI_MULT)
    ) % F.lit(_CI_MOD)
    from pyspark.sql import Window

    w_s = Window.partitionBy("event_type").orderBy(h.asc(), F.col("event_id"))
    samp = (
        ev.select("event_type", F.col("value").alias("v"), "event_id")
        .withColumn("idx", F.row_number().over(w_s))
        .where(F.col("idx") <= CI_SAMPLE_N)
        .select("event_type", "v", "idx")
    )
    info = samp.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_sample")
    ).withColumn("th", rolling_hash("event_type"))
    d1 = info.select(
        "event_type",
        "n_sample",
        "th",
        F.explode(F.sequence(F.lit(1), F.lit(CI_B))).alias("b"),
    )
    d2 = d1.select(
        "event_type",
        "n_sample",
        "th",
        "b",
        F.explode(F.sequence(F.lit(1).cast("bigint"), F.col("n_sample"))).alias("i"),
    )
    pick = (
        F.lit(1)
        + ((F.col("th") * 131 + F.col("b")) % _CI_MOD * 131 + F.col("i"))
        % _CI_MOD
        % F.col("n_sample")
    )
    dr = d2.select("event_type", "b", "i", pick.alias("pick"))
    j = dr.join(
        F.broadcast(samp),
        (dr["event_type"] == samp["event_type"]) & (samp["idx"] == dr["pick"]),
    ).select(dr["event_type"], "b", "i", "v")
    w_m = Window.partitionBy("event_type", "b").orderBy("v", "i")
    m1 = j.withColumn("r", F.row_number().over(w_m))
    meds = (
        m1.join(F.broadcast(info.select("event_type", "n_sample")), "event_type")
        .where(F.col("r") == F.expr("(n_sample + 1) div 2"))
        .select("event_type", "b", F.col("v").alias("med"))
    )
    w_c = Window.partitionBy("event_type").orderBy("med", "b")
    mr = meds.withColumn("r", F.row_number().over(w_c))
    ci = mr.groupBy("event_type").agg(
        F.max(F.when(F.col("r") == 3, F.col("med"))).alias("ci_lo"),
        F.max(F.when(F.col("r") == CI_B - 2, F.col("med"))).alias("ci_hi"),
    )
    w_f = Window.partitionBy("event_type").orderBy("v", "idx")
    sm = (
        samp.join(F.broadcast(info.select("event_type", "n_sample")), "event_type")
        .withColumn("r", F.row_number().over(w_f))
        .where(F.col("r") == F.expr("(n_sample + 1) div 2"))
        .select("event_type", F.col("v").alias("sample_median"))
    )
    return (
        info.select("event_type", "n_sample")
        .join(sm, "event_type")
        .join(ci, "event_type")
        .select("event_type", "n_sample", "sample_median", "ci_lo", "ci_hi")
    )


# --- exact two-sample Kolmogorov–Smirnov drift statistic ---------------------

KS_TYPE_A = "click"
KS_TYPE_B = "purchase"
# Smirnov critical coefficient c(alpha=0.05); 6-dp literal, shared text
_KS_C05 = "1.358"

_KS_SQL = f"""
WITH pooled AS (
  SELECT value AS v, CASE WHEN event_type = '{KS_TYPE_A}' THEN 1 ELSE 0 END
           AS is_a, event_id
  FROM events
  WHERE event_type IN ('{KS_TYPE_A}', '{KS_TYPE_B}') AND value IS NOT NULL
),
n AS (
  SELECT CAST(sum(is_a) AS BIGINT) AS n1,
         CAST(sum(1 - is_a) AS BIGINT) AS n2
  FROM pooled
),
per_v AS (
  SELECT v, CAST(sum(is_a) AS BIGINT) AS a_cnt,
         CAST(sum(1 - is_a) AS BIGINT) AS b_cnt
  FROM pooled GROUP BY v
),
g AS (
  SELECT CAST(sum(a_cnt) OVER w AS BIGINT) AS c1,
         CAST(sum(b_cnt) OVER w AS BIGINT) AS c2
  FROM per_v
  WINDOW w AS (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
d AS (
  SELECT CAST(max(abs(c1 * n.n2 - c2 * n.n1)) AS BIGINT) AS d_num
  FROM g CROSS JOIN n
)
SELECT n.n1, n.n2,
       CAST(d.d_num AS DOUBLE) / (CAST(n.n1 AS DOUBLE) * CAST(n.n2 AS DOUBLE))
         AS ks_d,
       CAST(d.d_num AS DOUBLE) / (CAST(n.n1 AS DOUBLE) * CAST(n.n2 AS DOUBLE))
         > CAST({_KS_C05} AS DOUBLE)
           * sqrt((CAST(n.n1 AS DOUBLE) + CAST(n.n2 AS DOUBLE))
                  / (CAST(n.n1 AS DOUBLE) * CAST(n.n2 AS DOUBLE)))
         AS reject_05
FROM d CROSS JOIN n
"""


@query("value_ks_drift", oracle=_KS_SQL)
def value_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov statistic between the
    '{A}' and '{B}' value distributions (the standard drift /
    same-distribution test a feature pipeline runs between snapshots),
    plus the alpha=0.05 Smirnov decision.

    Exactness: D = sup|F1 − F2| is maximized over DISTINCT pooled
    values as max|c1·n2 − c2·n1| — PURE INT64 (no float ECDF), one
    final double division; the critical-value comparison is a shared
    double tree (sqrt is correctly rounded).

    Tie handling (ADVICE r7): the ECDFs are step functions evaluated
    AT each distinct value v, i.e. with the full tie group included —
    evaluating mid-group (per pooled row) overstates D whenever ties
    straddle the two samples (A={1,1}, B={1,1} would read D=1 instead
    of 0). The oracle aggregates per distinct v then takes one global
    cumulative window; the Spark side (round 15, guide §2.3/§2.4)
    mirrors that shape directly: ONE map-side-combinable aggregate per
    distinct v over the fact table (a_cnt, b_cnt), then an exact
    two-level prefix sum over the distinct-value frame
    (operators/ranking.global_cumsum — range partition + per-bucket
    window + broadcast offsets, never a single-partition pass).
    c1(v) = Σ_{v'≤v} a_cnt is precisely #A ≤ v with the full tie group
    included, so D falls out as max|c1·n2 − c2·n1| in pure int64.
    n1/n2 are the grand totals of the same aggregate. This replaces
    the round-7 formulation's THREE fact-table rankings (a/b/pooled
    global_rank + union + tie-snap window — 73 shuffles) with one
    fact shuffle plus distinct-value-sized work.
    """
    from data_pipeline_playground_spark.operators.ranking import (
        global_cumsum,
    )

    ev = table(spark, sf_dir, "events").where(
        F.col("event_type").isin(KS_TYPE_A, KS_TYPE_B)
        & F.col("value").isNotNull()
    )
    pooled = ev.select(
        F.col("value").alias("v"),
        F.when(F.col("event_type") == KS_TYPE_A, 1).otherwise(0).alias(
            "is_a"
        ),
    )
    per_v = pooled.groupBy("v").agg(
        F.sum("is_a").cast("bigint").alias("a_cnt"),
        F.sum(F.lit(1) - F.col("is_a")).cast("bigint").alias("b_cnt"),
    )
    g = global_cumsum(per_v, ["v"], ["a_cnt", "b_cnt"])
    n = g.agg(
        F.sum("a_cnt").cast("bigint").alias("n1"),
        F.sum("b_cnt").cast("bigint").alias("n2"),
    )
    d = (
        g.crossJoin(F.broadcast(n))
        .select(
            F.abs(
                F.col("cum_a_cnt") * F.col("n2")
                - F.col("cum_b_cnt") * F.col("n1")
            ).alias("dn")
        )
        .agg(F.max("dn").cast("bigint").alias("d_num"))
    )
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    ks = F.col("d_num").cast("double") / (n1d * n2d)
    crit = F.expr(f"CAST({_KS_C05} AS DOUBLE)") * F.sqrt(
        (n1d + n2d) / (n1d * n2d)
    )
    return (
        d.crossJoin(F.broadcast(n))
        .select("n1", "n2", ks.alias("ks_d"), (ks > crit).alias("reject_05"))
    )
