"""ML surface of the engine (SURVEY.md §2.8).

DataFrame-API only: the reference's RDD/mllib path (``G_2_rf_rdd.py:157``,
``LabeledPoint`` + ``mllib.RandomForest``) is maintenance-mode upstream and
pays per-row Python serialization, so the engine does not reproduce it —
``pyspark.ml`` pipelines cover the same capability (M4 vs M5) with
whole-stage-codegen'd featurization and no Python in the training loop.
"""

from big_data_analysis_for_stock_market_data_spark.ml.metrics import (
    binary_metrics,
    confusion_matrix,
    metrics_df,
)
from big_data_analysis_for_stock_market_data_spark.ml.rdd_compat import (
    CompatRandomForestModel,
    binary_classification_metrics,
    labeled_points,
    multiclass_metrics,
    train_classifier,
)
from big_data_analysis_for_stock_market_data_spark.ml.pipeline import (
    FitResult,
    correlated_split,
    cross_validate_rf,
    grouped_feature_stages,
    hash_split,
    make_pipeline,
    split_bucket,
    train_gbt,
    train_linear_svc,
    train_random_forest,
    train_rf_grouped,
)

__all__ = [
    "CompatRandomForestModel",
    "FitResult",
    "binary_classification_metrics",
    "labeled_points",
    "multiclass_metrics",
    "train_classifier",
    "binary_metrics",
    "confusion_matrix",
    "correlated_split",
    "cross_validate_rf",
    "grouped_feature_stages",
    "hash_split",
    "make_pipeline",
    "metrics_df",
    "split_bucket",
    "train_gbt",
    "train_linear_svc",
    "train_random_forest",
    "train_rf_grouped",
]
