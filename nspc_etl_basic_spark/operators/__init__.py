from nspc_etl_basic_spark.operators.schema_inference import (
    ColumnStats,
    InferredSchema,
    infer_schema,
)
from nspc_etl_basic_spark.operators.cast import cast_and_split
from nspc_etl_basic_spark.operators.sampling import (
    assign_split,
    cap_per_group,
    hash_ring_negatives,
    hash_sample,
    leakage_safe_split,
    mixture_order,
    pack_sequences,
    stratified_sample,
    take_until_budget,
    temperature_sample,
)
from nspc_etl_basic_spark.operators.dsir import (
    dsir_scores,
    dsir_weights,
    hashed_token_counts,
)
from nspc_etl_basic_spark.operators.mixing import mix_rates, mix_sources
from nspc_etl_basic_spark.operators.novelty import (
    ngram_novelty,
    ngram_overlap_matrix,
)
from nspc_etl_basic_spark.operators.packing import (
    pack_greedy,
    pack_incremental,
    pack_materialize,
    pack_report,
    pack_state,
    seqlen_plan,
    shard_assign,
    shard_report,
)
from nspc_etl_basic_spark.operators.skew import salted_count_by_key, salted_join

__all__ = [
    "dsir_scores",
    "dsir_weights",
    "hashed_token_counts",
    "mix_rates",
    "mix_sources",
    "ngram_novelty",
    "ngram_overlap_matrix",
    "pack_greedy",
    "pack_incremental",
    "pack_materialize",
    "pack_report",
    "pack_state",
    "seqlen_plan",
    "shard_assign",
    "shard_report",
    "ColumnStats",
    "InferredSchema",
    "infer_schema",
    "cast_and_split",
    "assign_split",
    "cap_per_group",
    "hash_ring_negatives",
    "hash_sample",
    "leakage_safe_split",
    "mixture_order",
    "pack_sequences",
    "stratified_sample",
    "take_until_budget",
    "temperature_sample",
    "salted_count_by_key",
    "salted_join",
]

from nspc_etl_basic_spark.operators.quality import (
    Check,
    completeness,
    compliance,
    maximum,
    mean_of,
    minimum,
    run_checks,
    uniqueness,
)
from nspc_etl_basic_spark.operators.scd import scd2_apply_changes, scd2_from_feed
from nspc_etl_basic_spark.operators.spandedup import dedup_spans
from nspc_etl_basic_spark.operators.anomaly import (
    moments,
    sufficient_stats,
    zscore_against,
    zscore_outliers,
)

__all__ += [
    "Check",
    "completeness",
    "compliance",
    "maximum",
    "mean_of",
    "minimum",
    "run_checks",
    "uniqueness",
    "scd2_apply_changes",
    "scd2_from_feed",
    "dedup_spans",
    "moments",
    "sufficient_stats",
    "zscore_against",
    "zscore_outliers",
]

from nspc_etl_basic_spark.operators.bpe import bpe_encode, train_bpe

__all__ += ["bpe_encode", "train_bpe"]

from nspc_etl_basic_spark.operators.pq import (
    pq_encode,
    pq_encode_kernel,
    pq_seed_codebooks,
    pq_topk,
    train_pq_codebooks,
)
from nspc_etl_basic_spark.operators.sketches import (
    heavy_hitters,
    histogram_quantiles,
    kmv_distinct,
)

__all__ += [
    "pq_encode",
    "pq_encode_kernel",
    "pq_seed_codebooks",
    "pq_topk",
    "train_pq_codebooks",
    "heavy_hitters",
    "histogram_quantiles",
    "kmv_distinct",
]

from nspc_etl_basic_spark.operators.resample import (
    ewma_by_key,
    resample_ffill,
    resample_interpolate,
)

__all__ += ["ewma_by_key", "resample_ffill", "resample_interpolate"]

from nspc_etl_basic_spark.operators.bootstrap import bootstrap_mean_ci
from nspc_etl_basic_spark.operators.mv import (
    incremental_refresh,
    mv_apply_delta,
    mv_delta,
    summary_mv,
)
from nspc_etl_basic_spark.operators.privacy import (
    k_anonymity_report,
    pseudonymize,
)
from nspc_etl_basic_spark.operators.quality import (
    referential_check,
    referential_suite,
)
from nspc_etl_basic_spark.operators.sampling import epoch_shuffle
from nspc_etl_basic_spark.operators.sequences import (
    cooccurrence_pairs,
    transition_counts,
)
from nspc_etl_basic_spark.operators.trend import (
    cusum_alarms,
    grouped_ols,
    welch_t,
)

__all__ += [
    "bootstrap_mean_ci",
    "incremental_refresh",
    "mv_apply_delta",
    "mv_delta",
    "summary_mv",
    "k_anonymity_report",
    "pseudonymize",
    "referential_check",
    "referential_suite",
    "epoch_shuffle",
    "cooccurrence_pairs",
    "transition_counts",
    "cusum_alarms",
    "grouped_ols",
    "welch_t",
]
