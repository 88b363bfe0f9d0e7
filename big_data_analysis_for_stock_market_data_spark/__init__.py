"""PySpark-native analytics engine re-expressing the query surface of the
reference project soniaferreira-pires/Big-Data-Analysis-for-Stock-Market-Data
(see SURVEY.md), built Spark-first: DataFrame/SQL plans optimized by Catalyst,
Pandas UDFs only where built-ins cannot express the semantics.

Public modules
--------------
- ``session``   : SparkSession builder with scale-sane defaults (AQE, Arrow, UTC)
- ``schema``    : explicit StructTypes for the stock fact table and test tables
- ``sources``   : readers/writers (parquet-first; csv kept as an ingest option)
- ``operators`` : relational/time-series operators (windows, aggregates,
                  indicators, joins, dedup, simsearch, text, multimodal)
- ``ml``        : DataFrame-API ML pipelines (assembler/scaler/PCA/RF/SVM) and
                  honestly-named metrics
- ``streaming`` : Structured Streaming variants of the label/window ops
"""

from big_data_analysis_for_stock_market_data_spark.session import get_session

__all__ = ["get_session"]
__version__ = "0.1.0"
