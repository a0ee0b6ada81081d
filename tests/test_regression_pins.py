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
