"""Determinism probes: every query is specified to be deterministic
(total orders on tiebreaks, hash-gated sampling, declared pivot values),
so running one twice in the same session must return the identical row
multiset. Guards the re-specified reference semantics (SURVEY §0.1) —
an unordered limit / tie-prone row_number / nondeterministic sample
regression shows up here before it shows up as a driver hash flake.
"""

from __future__ import annotations

import pytest

from conftest import SF_SMALL

from customer_360_etl_pipeline_on_azure_cloud_spark.testdata_queries import (
    CORE_QUERIES,
)

#: Tie-prone representatives: window tiebreaks, argmax ties, positional
#: zip, hash-gated samples, greedy packing, upsert merge.
TIE_PRONE = [
    "top_event_per_user",
    "supplier_most_flag",
    "positional_zip",
    "stratified_sample",
    "weighted_doc_sample",
    "dedup_user_event",
    "doc_packing",
    "orders_upsert",
    # round-5: per-query fused rankings (window tiebreaks on rrf doubles)
    # and the two-phase closure (iteration order must not leak into labels)
    "hybrid_search_multi",
    "dedup_clusters_twophase",
    # round-5 part 2: ranked cutoffs on computed scores (count/pmi/nll
    # desc with pair/doc tiebreaks) and the component-banded split
    "bpe_merge_pairs",
    "collocation_pmi",
    "doc_lm_perplexity",
    "cluster_aware_split",
]


@pytest.mark.parametrize("name", TIE_PRONE)
def test_query_is_deterministic_across_runs(spark, name):
    fn, _sql = CORE_QUERIES[name]
    first = sorted(tuple(str(v) for v in r) for r in fn(spark, SF_SMALL).collect())
    second = sorted(tuple(str(v) for v in r) for r in fn(spark, SF_SMALL).collect())
    assert first == second
    assert first, f"{name} returned no rows at {SF_SMALL}"
