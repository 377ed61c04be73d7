"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``filemapreduce_spark.queries`` (one QuerySpec per
operator from SURVEY.md §2 — Spark fn + DuckDB oracle twin); this file
just re-exposes the registry.
"""

from __future__ import annotations

import glob as _glob
import json as _json
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

from filemapreduce_spark.queries import load_all  # noqa: E402

_REGISTRY = load_all()


def _driver_verified() -> set[str]:
    """Names that already have a row in any past CORRECTNESS_r*.json.

    The driver samples the first ~50 entries of ``queries()`` each
    round; with a plain alphabetical dict the window never advances
    past the g's, so most of the registry would never receive a
    driver-verified row. Reading the ledger here lets each round's
    window land on queries no previous round covered.
    """
    seen: set[str] = set()
    for path in _glob.glob("/root/repo/CORRECTNESS_r*.json"):
        try:
            with open(path) as f:
                seen.update(_json.load(f).keys())
        except Exception:
            pass  # unreadable ledger file → treat as no coverage
    return seen


# Names the driver window should reach before the alphabetical rest
# (already-driver-verified names are dropped automatically). Round-6
# priorities per the round-5 verdict (next-round item 2): the 50
# highest-traffic never-verified ops — the core LLM dedup/ANN/quality
# family the verdict names explicitly, then the scalar/window/setop/
# stats basics and the two unverified sinks. Rounds 1-5 covered 208
# of 374; everything listed here has no CORRECTNESS row yet.
_PRIORITY = (
    # round-6 new operator gate (Job.sort_partitions ranged reduce)
    "engine_ranged_sort_digest",
    # verdict-named dedup / similarity / quality family
    "neardup_minhash_lsh",
    "simhash_neardup_pairs",
    "semdedup_cluster_prune",
    "quality_filter_pipeline",
    "text_stats_by_source",
    "sequence_pack_streams",
    "tfidf_cosine_pairs",
    "image_neardup_dhash",
    "winnowing_shared_fingerprints",
    "mmr_diversified_topk",
    # rest of the dedup / similarity family
    "neardup_embedding_cosine",
    "neardup_jaccard_exact",
    "neardup_incremental_vs_corpus",
    "segment_dedup_corpus",
    "simhash_signatures",
    "similarity_ivf_probe2",
    # text-pipeline staples
    "sessionize_events",
    "quality_scores",
    "token_count_bpe_ish",
    "word_frequencies_top100",
    "stratified_sample_per_lang",
    "sample_fixed_k_per_lang",
    "weighted_sample_by_length",
    "text_clean_redact",
    "repetition_quality_scores",
    "unigram_surprisal_filter",
    "tokenizer_fertility_by_lang",
    "vocab_coverage_oov",
    "multimodal_frame_sample",
    # scalar-function family
    "scalar_string_part",
    "scalar_math_case_lineitem",
    "scalar_datetime_orders",
    "regexp_family_documents",
    # set operations
    "setop_union_rich_nations",
    "setop_except_rich_nations",
    "setop_intersect_rich_nations",
    "setop_all_priorities",
    # stats / reshape basics
    "stats_moments_lineitem",
    "stats_corr_regression",
    "string_agg_nation_suppliers",
    "unpivot_order_money",
    "pivot_status_by_priority",
    "rollup_lineitem_status",
    "percentile_disc_order_prices",
    # joins / CDC / validation staples
    "range_join_signup_follows",
    "scd2_user_type_intervals",
    "scd2_incremental_merge",
    "snapshot_diff_order_activity",
    "table_checksum_by_flag",
    # unverified sinks + SQL text entry
    "sink_hilbert_roundtrip",
    "sink_manifest_exactly_once",
    "sql_text_monthly_revenue",
    "variant_props_events",
)


def _rotated() -> list[str]:
    """Registry names, never-driver-verified first (alpha within group)."""
    seen = _driver_verified()
    names = sorted(_REGISTRY)
    head = [n for n in _PRIORITY if n in _REGISTRY and n not in seen]
    rest_new = [n for n in names if n not in seen and n not in head]
    return head + rest_new + [n for n in names if n in seen]


def _ensure_conf(spark: SparkSession) -> None:
    """Confs the queries rely on when the driver built the session.

    Correctness confs (timezone, nanos) plus the perf confs the repo's
    own session factory (filemapreduce_spark/session.py) sets: without
    them a default driver session runs every query with 200 shuffle
    partitions, no AQE and no Arrow — multi-× slower at sf0.01.
    Each set is wrapped individually so one forbidden conf doesn't
    block the rest.
    """
    settings = {
        "spark.sql.session.timeZone": "UTC",
        # events.parquet stores TIMESTAMP(NANOS); read nanos as long
        "spark.sql.legacy.parquet.nanosAsLong": "true",
        "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
        # perf: the driver's runs are sf0.001/sf0.01 (~MB tables) —
        # 8 fat shuffle partitions beat core-count-many near-empty
        # ones at that size (measured -26%; scripts/perf_ab.py)
        "spark.sql.shuffle.partitions": "8",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    }
    for k, v in settings.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # non-fatal: session may forbid runtime conf changes


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _ensure_conf(spark)
    return _REGISTRY["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(spec):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ensure_conf(spark)
            return spec.fn(spark, sf_dir)

        run.__name__ = spec.name
        run.__doc__ = spec.doc
        return run

    return {name: wrap(_REGISTRY[name]) for name in _rotated()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for every SQL-expressible query."""
    return {
        name: _REGISTRY[name].oracle
        for name in _rotated()
        if _REGISTRY[name].oracle is not None
    }
