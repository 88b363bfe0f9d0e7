"""Evaluation metrics with honest names (reference M9, quirk Q5).

The reference printed ``BinaryClassificationEvaluator.evaluate`` — which
returns areaUnderROC — under the label "Accuracy" (``G_2_rf_nordd.py:72-74``)
and computed a confusion matrix by collecting every prediction row to the
driver for sklearn (``G_2_svm.py:178-181``). Here every metric carries its
real name and every computation stays distributed: evaluators run
treeAggregate reductions; the confusion matrix is a 4-row groupBy.
"""

from __future__ import annotations

from pyspark.ml.evaluation import (
    BinaryClassificationEvaluator,
    MulticlassClassificationEvaluator,
)
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def binary_metrics(
    predictions: DataFrame,
    label_col: str = "buy_or_sell",
    prediction_col: str = "prediction",
    raw_prediction_col: str = "rawPrediction",
) -> dict[str, float]:
    """areaUnderROC + accuracy + f1 in one place, correctly named.

    One caveat carried as API shape: ROC needs the raw score column, while
    accuracy/f1 need the thresholded prediction — the reference conflated
    the two (Q5)."""
    roc = BinaryClassificationEvaluator(
        labelCol=label_col, rawPredictionCol=raw_prediction_col,
        metricName="areaUnderROC",
    ).evaluate(predictions)
    multi = MulticlassClassificationEvaluator(
        labelCol=label_col, predictionCol=prediction_col
    )
    return {
        "areaUnderROC": float(roc),
        "accuracy": float(
            multi.evaluate(predictions, {multi.metricName: "accuracy"})
        ),
        "f1": float(multi.evaluate(predictions, {multi.metricName: "f1"})),
    }


def confusion_matrix(
    predictions: DataFrame,
    label_col: str = "buy_or_sell",
    prediction_col: str = "prediction",
) -> DataFrame:
    """Distributed confusion matrix: |classes|² rows, never a driver collect
    (vs sklearn-on-collected-rows at ``G_2_svm.py:178-181``)."""
    return (
        predictions.groupBy(
            F.col(label_col).cast("int").alias("label"),
            F.col(prediction_col).cast("int").alias("prediction"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("label", "prediction")
    )


def metrics_df(spark, metrics: dict[str, float]) -> DataFrame:
    """Lift a metrics dict into a stable-schema DataFrame (metric, value) —
    the queries() adapter shape for ML entries."""
    rows = [(k, float(v)) for k, v in sorted(metrics.items())]
    return spark.createDataFrame(rows, "metric string, value double")
