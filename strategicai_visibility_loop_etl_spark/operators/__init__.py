from .aggregate import agg_gsc, agg_ga4, weighted_mean
from .merge import merge_visibility, derive_metrics, add_run_metadata
from .scoring import expected_ctr_buckets_df, score_expected_ctr, intent_multiplier
from .anomaly import anomaly_ctr_underperf, ctr_candidates, schema_gaps
from .dedup import (
    dedup_exact,
    dedup_fingerprint,
    exactsubstr_dedup,
    ngram_jaccard_pairs,
    minhash_signatures,
    dedup_minhash_lsh,
    simhash64,
    dedup_simhash,
)
from .similarity import (
    knn_cosine_topk,
    ann_lsh_topk,
    kmeans_assign,
    cluster_sizes,
    semantic_neardup_pairs,
    semantic_dedup,
)
from .sketch import (
    bloom_prefilter_overlap,
    hll_shard_sketches,
    hll_merge_estimate,
    heavy_hitters,
    approx_heavy_hitters,
)
from .textprep import weighted_sample_k, build_vocab, encode_tokens
from .timeseries import resample_daily_ffill
from .relational import top_n_per_group, union_sources, pivot_counts, conditional_agg, salted_join
from .asof import asof_join
from .governance import write_autodetect_log, append_run_log

__all__ = [
    "top_n_per_group",
    "salted_join",
    "asof_join",
    "union_sources",
    "pivot_counts",
    "conditional_agg",
    "write_autodetect_log",
    "append_run_log",
    "agg_gsc",
    "agg_ga4",
    "weighted_mean",
    "merge_visibility",
    "derive_metrics",
    "add_run_metadata",
    "expected_ctr_buckets_df",
    "score_expected_ctr",
    "intent_multiplier",
    "anomaly_ctr_underperf",
    "ctr_candidates",
    "schema_gaps",
    "dedup_exact",
    "dedup_fingerprint",
    "exactsubstr_dedup",
    "ngram_jaccard_pairs",
    "minhash_signatures",
    "dedup_minhash_lsh",
    "simhash64",
    "dedup_simhash",
    "knn_cosine_topk",
    "ann_lsh_topk",
    "kmeans_assign",
    "cluster_sizes",
    "bloom_prefilter_overlap",
    "hll_shard_sketches",
    "hll_merge_estimate",
    "heavy_hitters",
    "approx_heavy_hitters",
    "weighted_sample_k",
    "build_vocab",
    "encode_tokens",
    "resample_daily_ffill",
    "semantic_neardup_pairs",
    "semantic_dedup",
]
