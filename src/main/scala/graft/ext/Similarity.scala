package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.{QueryDef, Tables}

/** Similarity search over the embedding column (north star): brute-force
  * cosine top-k as the exact baseline, and a random-hyperplane LSH
  * variant as the scale path. The query set is broadcast, so the scan of
  * the candidate side is shuffle-free and embarrassingly parallel — the
  * right shape for "k queries against 100 TB of vectors".
  */
object Similarity {

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** Cosine via the native codegen expression
    * (graft.functions.CosineSimilarity) — one fused loop inside
    * WholeStageCodegen; the higher-order-function formulation is
    * CodegenFallback and would break the codegen stage. Identical FP
    * result to dot/(sqrt(nx)*sqrt(ny)) computed sequentially, so the
    * DuckDB oracle still matches bitwise. */
  private def cosine(a: Column, b: Column): Column =
    graft.functions.CosineSimilarity.cosineSim(a, b)

  /** Exact brute-force cosine top-5 for each query vector (vec_id < 10):
    * broadcast the query set, score every vector with the fused codegen
    * cosine, take the per-query top-k with a window over the scan. */
  private val q34KnnBrute = QueryDef(
    (s, dir) => {
      val e = Tables(s, dir, "embeddings")
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val c = e.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))
      val scored = c.join(broadcast(q), col("n_id") =!= col("q_id"))
        .withColumn("cos_raw", cosine(col("q_emb"), col("n_emb")))
      val w = Window.partitionBy("q_id").orderBy(desc("cos_raw"), asc("n_id"))
      scored.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .select(col("q_id"), col("n_id"),
          round(col("cos_raw"), 6).as("cosine"),
          col("rk").cast("long").as("rk"))
        .orderBy("q_id", "rk")
    },
    """WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb
      |           FROM embeddings WHERE vec_id < 10),
      |p AS (SELECT q_id, vec_id AS n_id,
      |        list_sum(list_transform(q_emb,
      |          (x,i) -> CAST(x AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))
      |          AS dot,
      |        sqrt(list_sum(list_transform(q_emb,
      |          x -> CAST(x AS DOUBLE) * x))) AS nq,
      |        sqrt(list_sum(list_transform(embedding,
      |          x -> CAST(x AS DOUBLE) * x))) AS nn
      |      FROM embeddings, q WHERE vec_id <> q_id)
      |SELECT q_id, n_id, round(dot/(nq*nn), 6) AS cosine,
      |       row_number() OVER (PARTITION BY q_id
      |         ORDER BY dot/(nq*nn) DESC, n_id) AS rk
      |FROM p QUALIFY rk <= 5 ORDER BY q_id, rk""")

  /** Random-hyperplane LSH ANN: 4 fixed hyperplanes (seeded, deterministic)
    * give every vector a 4-bit sign bucket; queries only score vectors in
    * their own bucket. Candidate scoring is ~1/2^4 of brute force in
    * expectation — the IVF-style scale path. Bucket assignment is
    * hash-like (no SQL oracle); exact cosine math is oracle-covered by
    * q34. */
  private val q35KnnLsh = QueryDef.noOracle(
    (s, dir) => {
      val rnd = new scala.util.Random(42)
      val planes: Seq[Column] = Seq.fill(4)(
        typedlit(Array.fill(64)(rnd.nextGaussian())))
      def bucket(v: Column): Column =
        planes.zipWithIndex.map { case (p, i) =>
          when(dot(v, p) > 0, lit(1 << i)).otherwise(lit(0))
        }.reduce(_ + _)
      val e = Tables(s, dir, "embeddings")
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
          bucket(col("embedding")).as("q_bucket"))
      val c = e.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"),
        bucket(col("embedding")).as("n_bucket"))
      val scored = c.join(broadcast(q),
          col("n_bucket") === col("q_bucket") && col("n_id") =!= col("q_id"))
        .withColumn("cos_raw", cosine(col("q_emb"), col("n_emb")))
      val w = Window.partitionBy("q_id").orderBy(desc("cos_raw"), asc("n_id"))
      scored.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .select(col("q_id"), col("n_id"),
          round(col("cos_raw"), 6).as("cosine"),
          col("rk").cast("long").as("rk"))
        .orderBy("q_id", "rk")
    })

  val defs: Map[String, QueryDef] = Map(
    "q34_knn_cosine" -> q34KnnBrute,
    "q35_knn_lsh" -> q35KnnLsh,
  )
}
