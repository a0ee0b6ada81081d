"""Named regression pins for fixes that the driver has never
re-sampled (VERDICT r4 §Next #9).

Both queries below had r2 driver value-failures, were fixed in r3
(array-hash canonicalization; decode-histogram rounding), and have
been green in the generic oracle mirror ever since — but the driver's
50-query sample never revisited them. The generic mirror
(test_queries_oracle.py) already covers them; these named pins exist
so a future regression fails a test that SAYS which long-ago fix
broke, rather than a parametrized row in a 158-case sweep.
"""

from __future__ import annotations

import pytest

from data_pipeline_playground_spark.registry import all_oracle_sql, all_queries
from tests.oracle import compare

_PINNED = ["group_collect_docs", "multimodal_decode_histogram"]


@pytest.mark.parametrize("name", _PINNED)
def test_never_resampled_r3_fix_stays_green(name, spark, sf_dir, oracle_con):
    queries, oracles = all_queries(), all_oracle_sql()
    assert name in oracles, f"{name} lost its oracle entry"
    compare(queries[name](spark, sf_dir), oracle_con, oracles[name], name=name)


def test_ks_drift_cross_sample_ties_synthetic(spark, tmp_path):
    """ADVICE r7 (medium): KS must evaluate the ECDF gap only AT each
    distinct pooled value (full tie group included). The pre-r8
    per-row formulation read D=1.0 on A={1,1}, B={1,1}; the correct
    statistic is 0. Second case pins a hand-computed D=0.5."""
    from data_pipeline_playground_spark.queries.sketches import value_ks_drift

    def run(rows):
        df = spark.createDataFrame(
            [(i, None, i, t, float(v), None) for i, (t, v) in enumerate(rows)],
            "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double, props string",
        )
        d = str(tmp_path / f"sf_{len(rows)}_{hash(tuple(rows)) & 0xffff}")
        df.write.mode("overwrite").parquet(d + "/events.parquet")
        return value_ks_drift(spark, d).collect()[0]

    all_tied = run([("click", 1), ("click", 1), ("purchase", 1), ("purchase", 1)])
    assert all_tied.ks_d == 0.0 and not all_tied.reject_05

    # F1 steps at 1(.5) 2(1.0); F2 at 1(.5) 3(1.0) -> sup gap 0.5 at v=2
    half = run([("click", 1), ("click", 2), ("purchase", 1), ("purchase", 3)])
    assert half.ks_d == 0.5
