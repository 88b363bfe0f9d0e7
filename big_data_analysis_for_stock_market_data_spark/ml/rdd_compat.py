"""mllib-RDD-API compatibility shim (reference M5-M7), executed Spark-first.

The reference's RDD training path (``G_2_rf_rdd.py:25-31,157-196``) lifts
Rows to ``LabeledPoint``s, trains ``mllib.tree.RandomForest.trainClassifier``
(numClasses=2, gini, numTrees=10, maxDepth=10, maxBins=32, seed=42), predicts
on a features RDD, zips labels with predictions, and feeds the pair RDD to
``BinaryClassificationMetrics`` / ``MulticlassMetrics``.

``pyspark.mllib`` is maintenance-mode upstream and every hop of that flow
pays per-row Python serialization, so the engine does NOT reproduce its
internals (SURVEY.md §2.8). What a user porting those scripts actually
needs is the API *shape* — this module provides it with the DataFrame
engine underneath:

- :func:`labeled_points` is the LabeledPoint lift (M5) as a two-column
  (label, features-vector) DataFrame — one JVM-side projection, no
  Python lambda per row;
- :func:`train_classifier` is ``trainClassifier``-shaped (same keyword
  surface incl. ``categoricalFeaturesInfo``/``featureSubsetStrategy``) and
  runs ``pyspark.ml.RandomForestClassifier``;
- :meth:`CompatRandomForestModel.predict` accepts the features frame (or
  an RDD of vectors, converted once) and returns predictions distributed —
  the reference's ``model.predict(rdd.map(lambda x: x.features))``;
- :func:`binary_classification_metrics` /
  :func:`multiclass_metrics` consume (label, prediction) pairs like the
  mllib evaluators, computed as DataFrame aggregations.

The reference's own PDF (p.23/p.25) documents this path's
version-sensitivity — ROC 0.58 (RDD) vs 0.77 (DataFrame) on identical
data — which is the second reason the engine standardizes on one
execution path and keeps this module a thin adapter.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.ml.classification import (
    RandomForestClassificationModel,
    RandomForestClassifier,
)
from pyspark.ml.feature import VectorAssembler
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_analysis_for_stock_market_data_spark.ml.pipeline import DEFAULT_SEED

LABEL_COL = "label"
FEATURES_COL = "features"

#: trainClassifier impurity values supported by the DataFrame RF.
_IMPURITIES = ("gini", "entropy")


def labeled_points(
    df: DataFrame,
    label_col: str,
    feature_cols: Sequence[str] | None = None,
) -> DataFrame:
    """M5: the ``LabeledPoint`` lift. Reference shape:
    ``rdd.map(lambda row: LabeledPoint(row[i], row[:i] + row[i+1:]))``
    (``G_2_rf_rdd.py:157``) — all non-label columns become the feature
    vector, in column order. Here: one VectorAssembler projection to
    (label double, features vector); nothing leaves the JVM."""
    cols = list(feature_cols) if feature_cols else [
        c for c in df.columns if c != label_col
    ]
    assembled = VectorAssembler(
        inputCols=cols, outputCol=FEATURES_COL
    ).transform(df)
    return assembled.select(
        F.col(label_col).cast("double").alias(LABEL_COL), FEATURES_COL
    )


@dataclass
class CompatRandomForestModel:
    """``mllib.tree.RandomForestModel``-shaped wrapper over the DataFrame
    model. ``predict`` is distributed (model.transform), never a driver
    loop; single-vector predict is supported for parity but routed through
    a 1-row frame."""

    _model: RandomForestClassificationModel

    def predict(self, features) -> DataFrame:
        """Predict for a features input. Accepts the (label, features)
        frame from :func:`labeled_points` (label column ignored), any
        DataFrame with a ``features`` vector column, or an RDD of vectors
        (converted to a frame once — the reference's
        ``predict(rdd.map(lambda x: x.features))`` call shape). Returns a
        DataFrame with a double ``prediction`` column appended."""
        if not isinstance(features, DataFrame):
            from pyspark.ml.linalg import VectorUDT
            from pyspark.sql.types import StructField, StructType

            spark = SparkSession.getActiveSession()
            features = spark.createDataFrame(
                features.map(lambda v: (v,)),
                StructType([StructField(FEATURES_COL, VectorUDT())]),
            )
        out = self._model.transform(features)
        return out.select(
            *[c for c in features.columns],
            F.col("prediction").alias("prediction"),
        )

    @property
    def numTrees(self) -> int:  # noqa: N802 - mllib casing
        return self._model.getNumTrees

    def toDebugString(self) -> str:  # noqa: N802 - mllib casing
        return self._model.toDebugString


def train_classifier(
    data: DataFrame,
    numClasses: int = 2,  # noqa: N803 - mllib keyword casing
    categoricalFeaturesInfo: dict | None = None,  # noqa: N803
    numTrees: int = 10,  # noqa: N803
    featureSubsetStrategy: str = "auto",  # noqa: N803
    impurity: str = "gini",
    maxDepth: int = 10,  # noqa: N803
    maxBins: int = 32,  # noqa: N803
    seed: int = DEFAULT_SEED,
) -> CompatRandomForestModel:
    """M6: ``RandomForest.trainClassifier`` signature
    (``G_2_rf_rdd.py:163-164``) over the DataFrame engine. ``data`` is the
    (label, features) frame from :func:`labeled_points`.

    ``categoricalFeaturesInfo`` must be empty/None: the DataFrame API
    carries categorical metadata on the vector column itself; the reference
    passes ``{}``. ``numClasses`` is validated against the data rather than
    trusted (mllib silently mispredicted when it was wrong)."""
    if categoricalFeaturesInfo:
        raise ValueError(
            "categoricalFeaturesInfo is not supported; encode categorical "
            "features upstream (the DataFrame API reads categorical "
            "metadata from the vector column)"
        )
    if impurity not in _IMPURITIES:
        raise ValueError(f"impurity must be one of {_IMPURITIES}")
    rf = RandomForestClassifier(
        labelCol=LABEL_COL,
        featuresCol=FEATURES_COL,
        numTrees=numTrees,
        maxDepth=maxDepth,
        maxBins=maxBins,
        impurity=impurity,
        featureSubsetStrategy=featureSubsetStrategy,
        seed=seed,
    )
    model = rf.fit(data)
    if model.numClasses != numClasses:
        raise ValueError(
            f"data has {model.numClasses} classes, caller declared "
            f"{numClasses}"
        )
    from big_data_analysis_for_stock_market_data_spark.ml.pipeline import (
        strip_training_summaries,
    )

    return CompatRandomForestModel(strip_training_summaries(model))


def _pairs_frame(labels_and_predictions) -> DataFrame:
    """(label, prediction) input as a DataFrame: accepts the zipped pair
    RDD shape (``G_2_rf_rdd.py:196``) or a two-column frame."""
    if isinstance(labels_and_predictions, DataFrame):
        a, b = labels_and_predictions.columns[:2]
        return labels_and_predictions.select(
            F.col(a).cast("double").alias("label"),
            F.col(b).cast("double").alias("prediction"),
        )
    return labels_and_predictions.toDF(["label", "prediction"]).select(
        F.col("label").cast("double"), F.col("prediction").cast("double")
    )


def binary_classification_metrics(labels_and_predictions) -> dict[str, float]:
    """M7: ``BinaryClassificationMetrics`` surface (areaUnderROC /
    areaUnderPR) as DataFrame evaluators — honest metric names (Q5), no
    driver-side collect."""
    from pyspark.ml.evaluation import BinaryClassificationEvaluator

    pairs = _pairs_frame(labels_and_predictions)
    out = {}
    for metric in ("areaUnderROC", "areaUnderPR"):
        ev = BinaryClassificationEvaluator(
            labelCol="label", rawPredictionCol="prediction",
            metricName=metric,
        )
        out[metric] = float(ev.evaluate(pairs))
    return out


def multiclass_metrics(labels_and_predictions) -> dict[str, float]:
    """M7: ``MulticlassMetrics`` accuracy/weighted-F1 as one aggregate
    pass (the reference collected to sklearn for its confusion matrix —
    see ml/metrics.confusion_matrix for the distributed form)."""
    pairs = _pairs_frame(labels_and_predictions)
    agg = pairs.agg(
        F.avg((F.col("label") == F.col("prediction")).cast("double")).alias(
            "accuracy"
        ),
        F.count(F.lit(1)).alias("n"),
    ).head()
    from pyspark.ml.evaluation import MulticlassClassificationEvaluator

    f1 = MulticlassClassificationEvaluator(
        labelCol="label", predictionCol="prediction", metricName="f1"
    ).evaluate(pairs)
    return {"accuracy": float(agg["accuracy"]), "f1": float(f1),
            "n": float(agg["n"])}
