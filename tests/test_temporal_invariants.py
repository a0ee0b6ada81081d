"""Invariant tests for the temporal operators (queries/temporal.py):
the as-of join against a brute-force per-row model, funnel ordering,
percentile monotonicity, and rollup consistency."""

from __future__ import annotations

from data_pipeline_playground_spark.registry import all_queries
from data_pipeline_playground_spark.tables import table

_QUERIES = all_queries()


def test_asof_matches_bruteforce_model(spark, sf_dir):
    """The union-and-carry-forward as-of join must equal the obvious
    per-purchase max-over-earlier-clicks definition, computed brute
    force in Python."""
    ev = table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    rows = ev.filter(ev.event_type.isin("purchase", "click")).collect()
    clicks_by_user: dict[int, list] = {}
    for r in rows:
        if r.event_type == "click":
            clicks_by_user.setdefault(r.user_id, []).append(r.ts)
    expected = {}
    for r in rows:
        if r.event_type == "purchase":
            earlier = [t for t in clicks_by_user.get(r.user_id, []) if t < r.ts]
            expected[r.event_id] = max(earlier) if earlier else None

    got = {
        r.purchase_id: r.last_click_ts
        for r in _QUERIES["asof_last_click"](spark, sf_dir).collect()
    }
    assert got == expected


def test_funnel_users_ordering(spark, sf_dir):
    res = _QUERIES["funnel_users"](spark, sf_dir).collect()
    assert len(res) > 0
    for r in res:
        assert r.first_view < r.first_click < r.first_purchase


def test_percentiles_monotone(spark, sf_dir):
    # events_value_stats absorbed event_value_percentiles (round 10)
    for r in _QUERIES["events_value_stats"](spark, sf_dir).collect():
        assert r.p25 <= r.p50 <= r.p75 <= r.p90 <= r.p95 <= r.p99
        assert r.n > 0


def test_pivot_unpivot_roundtrip(spark, sf_dir):
    """The stack()-based melt is the exact inverse of the pivot: the
    former events_unpivot_daily (unregistered in the round-10
    consolidation) survives as this pin — wide pivot -> stack equals
    the long-form conditional counts computed directly."""
    from pyspark.sql import functions as F

    ev = table(spark, sf_dir, "events")
    wide = (
        ev.groupBy(F.to_date(F.date_trunc("day", "ts")).alias("event_day"))
        .pivot("event_type", ["click", "view"])
        .agg(F.count(F.lit(1)))
    )
    melted = wide.select(
        "event_day",
        F.expr("stack(2, 'click', click, 'view', view) AS (kind, n)"),
    ).filter(F.col("n").isNotNull())
    direct = (
        ev.filter(F.col("event_type").isin("click", "view"))
        .groupBy(
            F.to_date(F.date_trunc("day", "ts")).alias("event_day"),
            F.col("event_type").alias("kind"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    got = sorted(map(tuple, melted.collect()))
    want = sorted(map(tuple, direct.collect()))
    assert got == want


def test_rollup_day_equals_hour_sum(spark, sf_dir):
    """The day grain re-aggregates hour partials; totals must agree
    exactly (decimal partials) and with the raw event count."""
    rows = _QUERIES["events_rollup_hierarchical"](spark, sf_dir).collect()
    hours = [r for r in rows if r.grain == "hour"]
    days = [r for r in rows if r.grain == "day"]
    assert sum(r.n_events for r in hours) == sum(r.n_events for r in days)
    assert abs(sum(r.total_value for r in hours) - sum(r.total_value for r in days)) < 1e-6
    n_events = table(spark, sf_dir, "events").count()
    assert sum(r.n_events for r in days) == n_events


def test_approx_distinct_within_rsd(spark, sf_dir):
    """The query's own HLL accuracy certificate holds, and its exact
    column matches an independent countDistinct."""
    from pyspark.sql import functions as F

    ev = table(spark, sf_dir, "events")
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    rows = _QUERIES["events_sketch_certificates"](spark, sf_dir).collect()
    assert {r.event_type for r in rows} == set(exact)
    for r in rows:
        assert r.exact_users == exact[r.event_type]
        assert r.hll_within_6pct


def test_approx_quantiles_near_exact(spark, sf_dir):
    """The merged sketch query's accuracy certificate holds and its
    exact percentiles match the exact-percentile stats profile."""
    exact = {r.event_type: r for r in _QUERIES["events_value_stats"](spark, sf_dir).collect()}
    rows = _QUERIES["events_sketch_certificates"](spark, sf_dir).collect()
    assert {r.event_type for r in rows} == set(exact)
    for r in rows:
        e = exact[r.event_type]
        assert r.p50_exact == e.p50
        assert r.p95_exact == e.p95
        assert r.sketch_within_bound


def test_quartiles_approx_buckets_balanced(spark, sf_dir):
    """The approx-cut bucketize yields 4 buckets, each holding ~n/4
    (its own certificate column), with no global sort in the plan."""
    df = _QUERIES["customer_spend_quartiles_approx"](spark, sf_dir)
    rows = df.collect()
    assert sorted(r.quartile for r in rows) == [1, 2, 3, 4]
    assert all(r.n_within_bound for r in rows)


def test_range_join_counts_bounded(spark, sf_dir):
    """Every error row appears exactly once, and its neighborhood count
    never exceeds the user's total event count."""
    from pyspark.sql import functions as F

    ev = table(spark, sf_dir, "events")
    per_user = {r.user_id: r.n for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    n_errors = ev.filter(ev.event_type == "error").count()
    res = _QUERIES["error_neighborhood_5m"](spark, sf_dir).collect()
    assert len(res) == n_errors
    assert len({r.error_id for r in res}) == n_errors
    for r in res:
        assert 0 <= r.n_prior_5m < per_user[r.user_id]


def test_cusum_closed_form_equals_sequential_recurrence(spark, sf_dir):
    """The distributed closed form S_i = C_i − min(0, prefix-min C)
    must reproduce Page's sequential recurrence S_i = max(0, S_{i-1} +
    d_i) replayed in pure Python over the same (ts, event_id) order —
    for every event, exactly."""
    from decimal import Decimal

    from data_pipeline_playground_spark.queries.timeseries import (
        CUSUM_ALARM,
        CUSUM_SLACK,
    )
    from data_pipeline_playground_spark.tables import table as _table

    got = {
        (r.user_id, r.event_id): (r.cusum, r.is_alarm)
        for r in _QUERIES["events_cusum_drift"](spark, sf_dir).collect()
    }
    ev = (
        _table(spark, sf_dir, "events")
        .select("user_id", "event_id", "ts", "value")
        .collect()
    )
    by_user = {}
    for r in sorted(ev, key=lambda r: (r.ts, r.event_id)):
        by_user.setdefault(r.user_id, []).append(r)
    n_checked = 0
    for uid, rows in by_user.items():
        n_u = len(rows)
        s_u = sum(Decimal(str(r.value)).quantize(Decimal("0.000001")) for r in rows)
        s = Decimal(0)
        for r in rows:
            v = Decimal(str(r.value)).quantize(Decimal("0.000001"))
            d = n_u * v - s_u - n_u * CUSUM_SLACK
            s = max(Decimal(0), s + d)
            want_stat = float(s) / n_u
            want_alarm = s > n_u * CUSUM_ALARM
            stat, alarm = got[(uid, r.event_id)]
            assert alarm == want_alarm, (uid, r.event_id)
            assert abs(stat - want_stat) < 1e-9, (uid, r.event_id, stat, want_stat)
            n_checked += 1
    assert n_checked == len(got) and n_checked > 0


def test_quartiles_exact_tier_equals_ranked(spark, sf_dir):
    """The unregistered ntile(4) spec tier (round-10 consolidation)
    must stay value-identical to the registered two-level-ranking
    scale tier that carries their shared oracle."""
    from data_pipeline_playground_spark.queries.analytics import (
        customer_spend_quartiles,
    )

    exact = sorted(map(tuple, customer_spend_quartiles(spark, sf_dir).collect()))
    ranked = sorted(
        map(
            tuple,
            _QUERIES["customer_spend_quartiles_ranked"](spark, sf_dir).collect(),
        )
    )
    assert exact == ranked


def test_median_udaf_matches_stats(spark, sf_dir):
    """The GROUPED_AGG pandas-UDAF surface (unregistered in the
    round-10 consolidation) stays value-identical to the built-in
    percentile path in events_value_stats."""
    from data_pipeline_playground_spark.queries.temporal import (
        event_value_median_udaf,
    )

    udaf = {
        r.event_type: (r.n, r.median_value)
        for r in event_value_median_udaf(spark, sf_dir).collect()
    }
    stats = {
        r.event_type: (r.n, r.p50)
        for r in _QUERIES["events_value_stats"](spark, sf_dir).collect()
    }
    assert set(udaf) == set(stats)
    for k, (n, med) in udaf.items():
        assert n == stats[k][0]
        assert round(med, 6) == stats[k][1]
