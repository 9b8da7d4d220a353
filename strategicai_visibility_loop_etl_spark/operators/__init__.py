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
from .textprep import (
    kneser_ney_scores,
    temperature_sample,
    weighted_sample_k,
    build_vocab,
    encode_tokens,
    bigram_lm_scores,
    pmi_collocations,
    dedup_lines_within_doc,
    carve_blocks,
    quality_blend,
    global_prefix_sum,
)
from .timeseries import resample_daily_ffill, rolling_zscore_anomalies
from .c4 import c4_quality_filter, c4_clean, synth_pages
from .retrieval import bm25_topk, document_postings
from .expectations import validate_expectations
from .aggregate import linear_trend, theil_sen_trend
from .dedup import (
    boilerplate_excision_incremental,
    boilerplate_line_excision,
    compact_count_index,
    dedup_minhash_incremental,
    exactsubstr_incremental,
    line_df_index_write,
    minhash_index_write,
    substr_gram_index_write,
)
from .graph import pagerank
from .linkage import fuzzy_match_pairs
from .similarity import (
    ivf_assign,
    ivf_centroids_write,
    ivf_search_index,
    ivfpq_topk,
    pq_topk,
    quantize_embeddings,
    quantized_cosine_topk,
)
from .clusters import leakage_free_split
from .governance import corpus_datasheet
from .relational import top_n_per_group, union_sources, pivot_counts, conditional_agg, salted_join
from .asof import asof_join
from .governance import write_autodetect_log, append_run_log

__all__ = [
    "bigram_lm_scores",
    "pmi_collocations",
    "dedup_lines_within_doc",
    "carve_blocks",
    "quality_blend",
    "global_prefix_sum",
    "rolling_zscore_anomalies",
    "c4_quality_filter",
    "c4_clean",
    "synth_pages",
    "bm25_topk",
    "document_postings",
    "validate_expectations",
    "linear_trend",
    "theil_sen_trend",
    "boilerplate_line_excision",
    "boilerplate_excision_incremental",
    "compact_count_index",
    "dedup_minhash_incremental",
    "exactsubstr_incremental",
    "line_df_index_write",
    "minhash_index_write",
    "substr_gram_index_write",
    "fuzzy_match_pairs",
    "ivf_assign",
    "ivf_centroids_write",
    "ivf_search_index",
    "ivfpq_topk",
    "pagerank",
    "kneser_ney_scores",
    "pq_topk",
    "temperature_sample",
    "quantize_embeddings",
    "quantized_cosine_topk",
    "leakage_free_split",
    "corpus_datasheet",
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
