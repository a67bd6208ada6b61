from .aggregates import (
    distinct_count,
    quantile_agg,
    quantile_cutoffs,
    sum_pivot,
    two_pass_segment,
)
from .cleaning import dedup_deterministic, drop_sentinels
from .dedup import (
    MinhashIndex,
    compact_minhash_index,
    containment_pairs,
    dedup_exact,
    jaccard_pairs,
    minhash_index,
    minhash_lsh_join,
    minhash_lsh_pairs,
    read_minhash_index,
    simhash_near_pairs,
    simhash_table,
    write_minhash_index,
)
from .fusion import rrf_fuse
from .similarity import (
    IvfIndex,
    cosine_topk_ivf_indexed,
    embedding_gram_fixed,
    read_ivf_index,
    semantic_dedup,
    write_ivf_index,
)
from .graph import connected_components, dedup_survivors, pagerank_fixed
from .joins import banded_range_join, lookup, positional_zip
from .quality import check_referential, check_rules, enforce_rules
from .text import hashed_linear_score
from .sets import union_by_name_all
from .windows import top_k_per_group

__all__ = [
    "distinct_count",
    "quantile_agg",
    "quantile_cutoffs",
    "sum_pivot",
    "two_pass_segment",
    "dedup_deterministic",
    "drop_sentinels",
    "dedup_exact",
    "compact_minhash_index",
    "containment_pairs",
    "jaccard_pairs",
    "minhash_index",
    "minhash_lsh_join",
    "minhash_lsh_pairs",
    "MinhashIndex",
    "read_minhash_index",
    "write_minhash_index",
    "rrf_fuse",
    "semantic_dedup",
    "embedding_gram_fixed",
    "IvfIndex",
    "write_ivf_index",
    "read_ivf_index",
    "cosine_topk_ivf_indexed",
    "simhash_near_pairs",
    "simhash_table",
    "lookup",
    "connected_components",
    "dedup_survivors",
    "pagerank_fixed",
    "check_rules",
    "check_referential",
    "enforce_rules",
    "hashed_linear_score",
    "banded_range_join",
    "positional_zip",
    "union_by_name_all",
    "top_k_per_group",
]
