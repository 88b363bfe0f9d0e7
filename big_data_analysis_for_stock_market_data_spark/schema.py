"""Explicit StructTypes for every table the engine touches.

The reference infers schemas at every read (``inferSchema=True`` at
``G_2_rf_nordd.py:24`` and seven sibling scripts — SURVEY.md §2.1-S1), which
costs a second full scan and risks type drift between runs. The engine ships
declared schemas; inference stays available as an opt-in on the CSV reader.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# A. stock_minute — the reference's 60-column minute-bar fact table
#    (schema source: G_2_data_exploration.ipynb cell 9; column list
#    G_2_rf_pca.py:73; FIXTURES.md §A).
# ---------------------------------------------------------------------------

_STOCK_DOUBLE_COLS: tuple[str, ...] = (
    "close", "high", "low", "open",
    "sma5", "sma10", "sma15", "sma20",
    "ema5", "ema10", "ema15", "ema20",
    "upperband", "middleband", "lowerband",
    "HT_TRENDLINE", "KAMA10", "KAMA20", "KAMA30",
    "ADX5", "ADX10", "ADX20", "APO",
    "CCI5", "CCI10", "CCI15",
    "macd510", "macd520", "macd1020", "macd1520", "macd1226",
    "MFI", "MOM10", "MOM15", "MOM20",
    "ROC5", "ROC10", "ROC20", "PPO",
    "RSI14", "RSI8",
    "slowk", "slowd", "fastk", "fastd", "fastksr", "fastdsr",
    "ULTOSC", "WILLR", "ATR", "Trange", "TYPPRICE", "HT_DCPERIOD",
    "BETA", "SAR", "TRIMA5", "TRIMA10", "TRIMA20",
)

STOCK_MINUTE = T.StructType(
    [T.StructField("date", T.TimestampType(), False),
     T.StructField("volume", T.IntegerType(), True)]
    + [T.StructField(c, T.DoubleType(), True) for c in _STOCK_DOUBLE_COLS]
)

#: Raw OHLCV subset — what the indicator library consumes (it recomputes the
#: 54 indicator columns the reference received precomputed).
STOCK_OHLCV = T.StructType([
    T.StructField("symbol", T.StringType(), False),
    T.StructField("date", T.TimestampType(), False),
    T.StructField("open", T.DoubleType(), True),
    T.StructField("high", T.DoubleType(), True),
    T.StructField("low", T.DoubleType(), True),
    T.StructField("close", T.DoubleType(), True),
    T.StructField("volume", T.LongType(), True),
])

# ---------------------------------------------------------------------------
# B. Driver synthetic tables (/root/testdata/sf*/ — FIXTURES.md §B).
# ---------------------------------------------------------------------------

REGION = T.StructType([
    T.StructField("r_regionkey", T.IntegerType(), True),
    T.StructField("r_name", T.StringType(), True),
])

NATION = T.StructType([
    T.StructField("n_nationkey", T.IntegerType(), True),
    T.StructField("n_name", T.StringType(), True),
    T.StructField("n_regionkey", T.IntegerType(), True),
])

CUSTOMER = T.StructType([
    T.StructField("c_custkey", T.LongType(), True),
    T.StructField("c_name", T.StringType(), True),
    T.StructField("c_nationkey", T.IntegerType(), True),
    T.StructField("c_acctbal", T.DoubleType(), True),
    T.StructField("c_mktsegment", T.StringType(), True),
])

SUPPLIER = T.StructType([
    T.StructField("s_suppkey", T.LongType(), True),
    T.StructField("s_name", T.StringType(), True),
    T.StructField("s_nationkey", T.IntegerType(), True),
    T.StructField("s_acctbal", T.DoubleType(), True),
])

PART = T.StructType([
    T.StructField("p_partkey", T.LongType(), True),
    T.StructField("p_name", T.StringType(), True),
    T.StructField("p_brand", T.StringType(), True),
    T.StructField("p_type", T.StringType(), True),
    T.StructField("p_size", T.IntegerType(), True),
    T.StructField("p_retailprice", T.DoubleType(), True),
])

ORDERS = T.StructType([
    T.StructField("o_orderkey", T.LongType(), True),
    T.StructField("o_custkey", T.LongType(), True),
    T.StructField("o_orderstatus", T.StringType(), True),
    T.StructField("o_totalprice", T.DoubleType(), True),
    T.StructField("o_orderdate", T.TimestampType(), True),
    T.StructField("o_orderpriority", T.StringType(), True),
])

LINEITEM = T.StructType([
    T.StructField("l_orderkey", T.LongType(), True),
    T.StructField("l_partkey", T.LongType(), True),
    T.StructField("l_suppkey", T.LongType(), True),
    T.StructField("l_linenumber", T.IntegerType(), True),
    T.StructField("l_quantity", T.DoubleType(), True),
    T.StructField("l_extendedprice", T.DoubleType(), True),
    T.StructField("l_discount", T.DoubleType(), True),
    T.StructField("l_tax", T.DoubleType(), True),
    T.StructField("l_returnflag", T.StringType(), True),
    T.StructField("l_linestatus", T.StringType(), True),
    T.StructField("l_shipdate", T.TimestampType(), True),
])

EVENTS = T.StructType([
    T.StructField("event_id", T.LongType(), True),
    T.StructField("ts", T.TimestampType(), True),
    T.StructField("user_id", T.LongType(), True),
    T.StructField("event_type", T.StringType(), True),
    T.StructField("value", T.DoubleType(), True),
    T.StructField("props", T.StringType(), True),
])

DOCUMENTS = T.StructType([
    T.StructField("doc_id", T.LongType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("lang", T.StringType(), True),
    T.StructField("source", T.StringType(), True),
    T.StructField("n_chars", T.LongType(), True),
])

EMBEDDINGS = T.StructType([
    T.StructField("vec_id", T.LongType(), True),
    T.StructField("embedding", T.ArrayType(T.FloatType()), True),
    T.StructField("label", T.IntegerType(), True),
])

TESTDATA_SCHEMAS: dict[str, T.StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}

#: Multimodal asset table (north-star): media payloads are opaque binary with
#: typed metadata; decode/feature steps are Pandas-UDF stages (operators/
#: multimodal.py). No driver table ships media, so tests synthesize rows.
MEDIA_ASSETS = T.StructType([
    T.StructField("asset_id", T.LongType(), False),
    T.StructField("modality", T.StringType(), False),   # image|audio|video
    T.StructField("mime_type", T.StringType(), True),
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
])
