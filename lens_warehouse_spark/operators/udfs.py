"""UDF / UDAF / UDTF surface X1-X5 (SURVEY.md §2.11).

Reference extensibility is "arbitrary Clojure fns in the peer" (public
repo ``src/lens/api.clj``; /root/reference empty, SURVEY.md §0). Our
surface is tiered by cost, and every tier is demonstrated on semantics
that a SQL oracle can still check:

  X1 row-at-a-time Python UDF   — the documented slow path (pickled rows)
  X2 vectorized pandas_udf      — Arrow batches, the default Python path
  X3 grouped-agg pandas_udf     — Series -> scalar inside agg()
  X4 applyInPandas grouped map  — whole-group pandas transforms
  X5 Python UDTF                — table function with lateral join

Hot paths elsewhere in this engine never use X1; it exists for parity
of capability, and the bench shows why it's last resort.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, LongType, StringType

from lens_warehouse_spark.catalog import table
from lens_warehouse_spark.registry import register


# ---------------------------------------------------------------------------
# X1: scalar Python UDF (row-at-a-time; last resort).
# ---------------------------------------------------------------------------
@register(
    "x1_python_udf",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_orderpriority = '1-URGENT' THEN 1
            WHEN o_orderpriority = '2-HIGH' THEN 2
            ELSE 9 END AS priority_code
FROM orders
""",
)
def x1_python_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.udf(returnType=IntegerType())
    def priority_code(p: str) -> int:
        return {"1-URGENT": 1, "2-HIGH": 2}.get(p, 9)

    return table(spark, sf_dir, "orders").select(
        "o_orderkey", priority_code("o_orderpriority").alias("priority_code")
    )


# ---------------------------------------------------------------------------
# X2: vectorized pandas UDF (Arrow batches).
# ---------------------------------------------------------------------------
@register(
    "x2_pandas_udf",
    oracle="""
SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
FROM documents
""",
)
def x2_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.pandas_udf(LongType())
    def token_count(texts: pd.Series) -> pd.Series:
        return texts.str.split(" ").map(len).astype("int64")

    return table(spark, sf_dir, "documents").select(
        "doc_id", token_count("text").alias("n_tokens")
    )


# ---------------------------------------------------------------------------
# X3: grouped-aggregate pandas UDF (Series -> scalar in agg()).
# ---------------------------------------------------------------------------
@register(
    "x3_pandas_udaf",
    oracle="""
SELECT event_type, round(sum(value), 4) AS total_value
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def x3_pandas_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd
    from pyspark.sql.types import DoubleType

    @F.pandas_udf(DoubleType())
    def total(values: pd.Series) -> float:
        return float(values.sum())

    return (
        table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.round(total("value"), 4).alias("total_value"))
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# X4: applyInPandas grouped map — per-user event ordinals computed in
# pandas (integer outputs keep it exactly oracle-checkable).
# ---------------------------------------------------------------------------
@register(
    "x4_apply_in_pandas",
    oracle="""
SELECT user_id, event_id,
       CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS ordinal,
       count(*) OVER (PARTITION BY user_id) AS n_user_events
FROM events
""",
)
def x4_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    def ordinals(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
        return pd.DataFrame(
            {
                "user_id": pdf["user_id"],
                "event_id": pdf["event_id"],
                "ordinal": pd.Series(range(1, len(pdf) + 1), dtype="int64"),
                "n_user_events": pd.Series([len(pdf)] * len(pdf), dtype="int64"),
            }
        )

    return (
        table(spark, sf_dir, "events")
        .select("user_id", "event_id", "ts")
        .groupBy("user_id")
        .applyInPandas(
            ordinals,
            "user_id long, event_id long, ordinal long, n_user_events long",
        )
    )


# ---------------------------------------------------------------------------
# X5: Python UDTF with lateral join (1 row -> N rows table function).
# ---------------------------------------------------------------------------
@register(
    "x5_python_udtf",
    oracle="""
SELECT doc_id, unnest(string_split(text, ' ')) AS token
FROM documents
WHERE doc_id < 50
""",
)
def x5_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="token: string")
    class Tokenize:
        def eval(self, text: str):
            for tok in text.split(" "):
                yield (tok,)

    spark.udtf.register("lws_tokenize", Tokenize)
    table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50).select(
        "doc_id", "text"
    ).createOrReplaceTempView("lws_udtf_docs")
    return spark.sql(
        "SELECT d.doc_id, t.token"
        " FROM lws_udtf_docs d, LATERAL lws_tokenize(d.text) t"
    )


# ---------------------------------------------------------------------------
# X6: Arrow-optimized Python scalar UDF (Spark 4 ``useArrow=True``) —
# the middle tier between x1's pickled row-at-a-time UDF and x2's
# pandas UDF: the same scalar Python function, but arguments/results
# cross the boundary as Arrow batches (no per-row pickling). The tier
# to reach for when logic is genuinely per-scalar Python yet the
# transfer cost must stay columnar. Same oracle shape as x1 so the
# three tiers are directly comparable in the bench.
# ---------------------------------------------------------------------------
@register(
    "x6_arrow_udf",
    oracle="""
SELECT o_orderkey,
       CAST(length(o_orderpriority) * 10 +
            CAST(substring(o_orderpriority, 1, 1) AS INT) AS INT) AS prio_feature
FROM orders
""",
)
def x6_arrow_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.udf(returnType=IntegerType(), useArrow=True)
    def prio_feature(p: str) -> int:
        return len(p) * 10 + int(p[0])

    return table(spark, sf_dir, "orders").select(
        "o_orderkey", prio_feature("o_orderpriority").alias("prio_feature")
    )
