"""User-facing facade — the equivalent of the reference's ``lens.api``
namespace (public repo ``src/lens/api.clj``; /root/reference empty,
SURVEY.md §0): one object wrapping catalog access, cohort queries, and
the analytics/data-pipeline operators, so a lens-warehouse user has a
single entry point instead of hunting through operator modules.

    from lens_warehouse_spark.engine import LensWarehouse
    lw = LensWarehouse(spark, "/root/testdata/sf0.01")
    lw.table("orders")
    lw.sql("SELECT count(*) FROM orders")
    lw.cohort_count(query)          # CNF cohort, one-shuffle plan
    lw.near_duplicates(0.7)         # MinHash-LSH + exact verify
    lw.knn(query_vec_id=0, k=10)    # exact cosine top-k
    lw.sessionize("30 minutes")     # session windows per user
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lens_warehouse_spark.catalog import TABLES, register_views, table
from lens_warehouse_spark.operators.cohort import (
    CohortQuery,
    cohort_count,
    cohort_facets,
    cohort_members,
)
from lens_warehouse_spark.llm.dedup import (
    jaccard,
    lsh_candidate_pairs,
    minhash_signatures,
    simhash,
)
from lens_warehouse_spark.llm.vector import dot


class LensWarehouse:
    """Session + scale-factor-directory bound engine facade."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = spark
        self.sf_dir = sf_dir
        self._views_registered = False

    # -- catalog (ref: Datomic schema / entity browse) ---------------------
    def table(self, name: str) -> DataFrame:
        return table(self.spark, self.sf_dir, name)

    def tables(self) -> list[str]:
        return list(TABLES)

    def sql(self, query: str) -> DataFrame:
        """SQL over all ten tables as views (registered on first use)."""
        if not self._views_registered:
            register_views(self.spark, self.sf_dir)
            self._views_registered = True
        return self.spark.sql(query)

    # -- cohort queries (ref: the flagship capability) ---------------------
    def cohort_from_json(self, obj: dict) -> CohortQuery:
        from lens_warehouse_spark.operators.wire import cohort_from_json

        return cohort_from_json(obj)

    def cohort_members(self, query: CohortQuery, strategy: str = "tagged") -> DataFrame:
        return cohort_members(query, self.spark, self.sf_dir, strategy)

    def cohort_count(self, query: CohortQuery, strategy: str = "tagged") -> DataFrame:
        return cohort_count(query, self.spark, self.sf_dir, strategy)

    def cohort_facets(
        self, query: CohortQuery, facet_col: str = "c_mktsegment"
    ) -> DataFrame:
        return cohort_facets(query, self.spark, self.sf_dir, facet_col)

    # -- dedup pipeline ----------------------------------------------------
    def dedup_exact(self) -> DataFrame:
        """Survivor per exact-content group (keep lowest doc_id)."""
        docs = self.table("documents").withColumn(
            "content_hash", F.sha2(F.lower(F.trim(F.col("text"))), 256)
        )
        return docs.groupBy("content_hash").agg(
            F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_copies")
        )

    def near_duplicates(self, threshold: float = 0.7) -> DataFrame:
        docs = self.table("documents")
        sigs = minhash_signatures(docs).select("doc_id", "sig")
        pairs = lsh_candidate_pairs(sigs)
        return jaccard(pairs, docs).filter(F.col("jaccard") >= threshold)

    def simhashes(self) -> DataFrame:
        return simhash(self.table("documents"))

    # -- similarity search -------------------------------------------------
    def knn(self, query_vec_id: int, k: int = 10) -> DataFrame:
        emb = self.table("embeddings")
        q = emb.filter(F.col("vec_id") == query_vec_id).select(
            F.col("embedding").alias("q_emb")
        )
        cand = emb.filter(F.col("vec_id") != query_vec_id)
        return (
            cand.crossJoin(F.broadcast(q))
            .select("vec_id", "label", F.round(dot("q_emb", "embedding"), 6).alias("cos"))
            .orderBy(F.col("cos").desc(), "vec_id")
            .limit(k)
        )

    # -- time / sessions ---------------------------------------------------
    def sessionize(self, gap: str = "30 minutes") -> DataFrame:
        ev = self.table("events")
        return (
            ev.groupBy(
                F.session_window(F.col("ts").cast("timestamp"), gap).alias("w"),
                "user_id",
            )
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(
                "user_id",
                F.unix_millis(F.col("w.start")).alias("session_start_ms"),
                "n_events",
            )
        )
