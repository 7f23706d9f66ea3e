"""Top-level convenience API (PEP 562 lazy exports — importing the package
stays free of Spark/pandas import cost until a symbol is touched).

The full surface lives in the submodules (operators/, sources/, ml/,
streaming/, plans/); these are the entry points a pipeline author reaches
for first.
"""

from __future__ import annotations

_EXPORTS = {
    # session + catalog
    "get_spark": ("end_to_end_data_engineering_and_ml_system_spark.session", "get_spark"),
    "load_table": ("end_to_end_data_engineering_and_ml_system_spark.sources.catalog", "load_table"),
    # query registry (the driver contract)
    "all_queries": ("end_to_end_data_engineering_and_ml_system_spark.plans.registry", "all_queries"),
    # dedup / similarity
    "lsh_verified_near_dups": ("end_to_end_data_engineering_and_ml_system_spark.operators.dedup", "lsh_verified_near_dups"),
    "dedup_cluster_labels": ("end_to_end_data_engineering_and_ml_system_spark.operators.graph", "dedup_cluster_labels"),
    # learned quality filter
    "fit_quality_classifier": ("end_to_end_data_engineering_and_ml_system_spark.ml.quality", "fit_quality_classifier"),
    "score_documents": ("end_to_end_data_engineering_and_ml_system_spark.ml.quality", "score_documents"),
    # tokenizer training
    "learn_bpe_merges": ("end_to_end_data_engineering_and_ml_system_spark.operators.bpe", "learn_bpe_merges"),
    "bpe_token_lengths": ("end_to_end_data_engineering_and_ml_system_spark.operators.bpe", "bpe_token_lengths"),
    # tracking / registry
    "Tracker": ("end_to_end_data_engineering_and_ml_system_spark.ml.registry", "Tracker"),
    "ModelRegistry": ("end_to_end_data_engineering_and_ml_system_spark.ml.registry", "ModelRegistry"),
    # versioned tables
    "TxTable": ("end_to_end_data_engineering_and_ml_system_spark.sources.txlog", "TxTable"),
}

__all__ = sorted(_EXPORTS)


def __getattr__(name: str):
    try:
        mod_name, attr = _EXPORTS[name]
    except KeyError:
        raise AttributeError(
            f"module {__name__!r} has no attribute {name!r}"
        ) from None
    import importlib

    return getattr(importlib.import_module(mod_name), attr)


def __dir__():
    return sorted(set(globals()) | set(_EXPORTS))
