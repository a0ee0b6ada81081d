"""Static registry of session-memo builders (VERDICT r11 #3 + ADVICE
r11 #1).

caching.memo keys are created at query-construction time deep inside
the query modules, so until round 12 there was no central list of memo
names: the bench discovered builds reactively (whichever timed query
touched a memo first paid its build into the ledger mid-loop), and the
cross-run merge had no way to tell a legitimate historical
``memo_build:<name>`` line item from a stale one left by a renamed or
removed memo.

This module is that list. Each entry maps a memo name to a TOUCH
callable ``(spark, sf_dir) -> Any`` — calling it runs the memo's
build() (builds are eager: the builders cache()+count() inside), so
``prebuild_all`` can construct every memo up front, concurrently,
before the bench's timed loop; the ledger entries it leaves behind are
booked to the same ``memo_build:<name>`` line items as before, and the
timed loop then sees only re-materializations (a clearCache artifact,
reported aside). ``KNOWN_MEMO_NAMES`` is the validation set for
cross-run base merges: a base ``memo_build:`` entry whose memo no
longer exists is dropped instead of riding the merge chain forever.

Completeness is pinned by ``tests/test_caching.py``: a source scan for
``memo(spark, "<name>"`` / ``memo_key="<name>"`` literals must yield
exactly the names registered here, so adding a memo without
registering its touch fails CI rather than silently reverting that
memo to first-touch accounting.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import SparkSession

TouchFn = Callable[[SparkSession, str], Any]


def touch_fns() -> dict[str, TouchFn]:
    """memo name -> callable that builds it (imports deferred: query
    modules are heavy and this module is imported by bench startup)."""
    from data_pipeline_playground_spark.queries import (
        dedup,
        dedup_advanced as da,
        ml,
        ml_checked,
        similarity,
        temporal,
    )

    return {
        # dedup family
        "minhash_est": da._minhash_est,
        "grams_sampled": da._grams_sampled,
        "minhash_est_sampled": da._minhash_est_sampled,
        "simhash_pairs": da._simhash_pairs,
        "shingle_hash_ex": da._shingle_hash_ex,
        "shingle_hash_ex_sampled": lambda spark, sf_dir: da._exact_jaccard_pairs(
            spark, sf_dir, da.JACCARD_THRESHOLD, doc_pred=da._doc_sample_pred
        ),
        "dedup_fuzzy_survivors": dedup.dedup_fuzzy,
        # embedding / ANN family
        "ivf_trained": similarity.ann_ivf_trained_topk,
        "embed_dup_pairs": similarity._embed_dup_pairs,
        "pq_model": similarity._pq_model,
        # ML / text family
        "tfidf_features": ml._tfidf_features_memo,
        "lda_fit": ml._lda_fit,
        "lexrank_doc_weights": ml._doc_weights_memo,
        "lexrank_sentence_artifacts": ml._sentence_artifacts_memo,
        "kmeans_checked_centroids": ml_checked._km_refined_centroids,
        "kmeans_checked_model": ml_checked._kmeans_checked_model,
        # events family
        "rollup_hour_partials": temporal.events_rollup_hierarchical,
    }


def known_memo_names() -> frozenset[str]:
    return frozenset(touch_fns())


# the one lambda touch lives in THIS module but wraps a builder defined
# in dedup_advanced — fingerprint it against the builder's module, not
# the wrapper's
_FP_MODULE_OVERRIDES = {
    "shingle_hash_ex_sampled":
        "data_pipeline_playground_spark.queries.dedup_advanced",
}


def memo_fingerprints() -> dict[str, str]:
    """memo name -> stable hash of the code that defines its build
    (ADVICE r12 #1): the touch callable's defining module source,
    combined with the source of every ``operators/`` and ``functions/``
    module (the deep dependencies builds actually execute — e.g. the
    lexrank_sentence_artifacts memo lives in queries/ml.py but its
    build runs operators/lexrank.py). bench.py records these in each
    bench output and refuses to min-merge a base ``memo_build:<name>``
    line item whose fingerprint differs — a changed builder
    auto-invalidates its historical timing instead of relying on the
    operator remembering SPARK_GRAFT_BENCH_FRESH. Module granularity
    over-invalidates (any edit in the module re-measures every memo it
    defines) — the safe direction: the cost is one fresh measurement,
    never a stale merged second."""
    import hashlib
    import inspect
    import pathlib
    import sys

    shared = hashlib.sha1()
    pkg_dir = pathlib.Path(__file__).parent
    for sub in ("operators", "functions"):
        for path in sorted((pkg_dir / sub).glob("*.py")):
            shared.update(path.read_bytes())
    shared_hex = shared.hexdigest()

    out: dict[str, str] = {}
    mod_src_cache: dict[str, str] = {}
    for name, fn in sorted(touch_fns().items()):
        mod_name = _FP_MODULE_OVERRIDES.get(
            name, getattr(fn, "__module__", __name__)
        )
        if mod_name not in mod_src_cache:
            mod_src_cache[mod_name] = inspect.getsource(sys.modules[mod_name])
        h = hashlib.sha1()
        h.update(mod_src_cache[mod_name].encode())
        h.update(shared_hex.encode())
        out[name] = h.hexdigest()[:12]
    return out


def prebuild_all(
    spark: SparkSession,
    sf_dir: str,
    failures: list[str] | None = None,
) -> list[str]:
    """Build every registered memo for (session, sf_dir), concurrently
    (independent builds overlap; same-key races serialize on
    caching.memo's per-key locks — a touch that nests another memo's
    build, e.g. minhash_est_sampled on grams_sampled, just blocks on
    the winner). Concurrency is BOUNDED (default 4, env
    $SPARK_GRAFT_PREBUILD_CONCURRENCY): the ledger books each build's
    per-thread exclusive seconds, so 17-way all-at-once submission
    would inflate every line item with sibling contention — a few at
    a time keeps the per-name numbers near their serial clean cost
    while still overlapping most of the wall. Returns the names
    attempted; a touch that raises is skipped (its queries will build
    reactively, exactly the pre-r12 behavior) so one broken family
    cannot sink the whole bench — the exception is LOGGED
    (logging.warning: name, type, message — ADVICE r12 #2; a silent
    swallow left a broken family reverting to first-touch accounting
    with no diagnostic) and the failed names are collected in
    ``failures`` for the bench record."""
    import logging
    import os
    import threading

    from data_pipeline_playground_spark.concurrency import run_concurrently

    fns = touch_fns()
    failed: list[str] = []
    limit = max(
        1, int(os.environ.get("SPARK_GRAFT_PREBUILD_CONCURRENCY", "4"))
    )
    slots = threading.BoundedSemaphore(limit)

    def _safe(name: str, fn: TouchFn):
        def run():
            with slots:
                try:
                    fn(spark, sf_dir)
                except Exception as exc:  # noqa: BLE001 — reactive fallback
                    logging.getLogger(__name__).warning(
                        "memo prebuild %r failed, reverting to "
                        "first-touch accounting: %s: %s",
                        name, type(exc).__name__, exc,
                    )
                    failed.append(name)

        return run

    run_concurrently([_safe(n, fn) for n, fn in sorted(fns.items())])
    if failures is not None:
        failures.extend(sorted(failed))
    return [n for n in sorted(fns) if n not in failed]
