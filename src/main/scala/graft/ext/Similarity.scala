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

  /** IVF-style ANN — the codebook-partitioned scale path: every vector is
    * assigned to its nearest of k coarse centroids (one broadcast of the
    * k-row codebook, N·k scoring, linear); queries then probe ONLY their
    * own cell via an equi-join on the centroid id. With real k-means
    * centroids this is textbook IVF-Flat; here the codebook is the first
    * 8 vectors (deterministic), which keeps the whole operator — argmax
    * assignment included — exactly oracle-checkable in DuckDB since the
    * cosine form and tiebreakers are the proven q34 ones. At 100 TB the
    * assignment is a map-side broadcast join and the probe shuffles on
    * cell id, so no stage touches the N² pair space. */
  private val q59KnnIvf = QueryDef(
    (s, dir) => {
      val e = Tables(s, dir, "embeddings")
      val codebook = e.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("c_id"),
          col("embedding").as("c_emb"))
      val wAssign = Window.partitionBy("vec_id")
        .orderBy(desc("ccos"), asc("c_id"))
      val assigned = e.crossJoin(broadcast(codebook))
        .withColumn("ccos", cosine(col("embedding"), col("c_emb")))
        .withColumn("arn", row_number().over(wAssign))
        .filter(col("arn") === 1)
        .select(col("vec_id"), col("embedding"), col("c_id").as("cell"))
      val q = assigned.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
          col("cell"))
      val cand = assigned.select(col("vec_id").as("n_id"),
        col("embedding").as("n_emb"), col("cell").as("n_cell"))
      val wTop = Window.partitionBy("q_id").orderBy(desc("cos_raw"), asc("n_id"))
      cand.join(broadcast(q),
          col("n_cell") === col("cell") && col("n_id") =!= col("q_id"))
        .withColumn("cos_raw", cosine(col("q_emb"), col("n_emb")))
        .withColumn("rk", row_number().over(wTop))
        .filter(col("rk") <= 5)
        .select(col("q_id"), col("n_id"),
          round(col("cos_raw"), 6).as("cosine"),
          col("rk").cast("long").as("rk"))
        .orderBy("q_id", "rk")
    },
    """WITH cb AS (SELECT CAST(vec_id AS INTEGER) AS c_id,
      |                   embedding AS c_emb
      |            FROM embeddings WHERE vec_id < 8),
      |sc AS (SELECT e.vec_id, e.embedding, c_id,
      |         list_sum(list_transform(e.embedding,
      |           (x,i) -> CAST(x AS DOUBLE) * CAST(c_emb[i] AS DOUBLE))) /
      |         (sqrt(list_sum(list_transform(e.embedding,
      |            x -> CAST(x AS DOUBLE) * x))) *
      |          sqrt(list_sum(list_transform(c_emb,
      |            x -> CAST(x AS DOUBLE) * x)))) AS ccos
      |       FROM embeddings e, cb),
      |a AS (SELECT vec_id, embedding, c_id AS cell,
      |        row_number() OVER (PARTITION BY vec_id
      |          ORDER BY ccos DESC, c_id) AS arn
      |      FROM sc QUALIFY arn = 1),
      |q AS (SELECT vec_id AS q_id, embedding AS q_emb, cell
      |      FROM a WHERE vec_id < 10),
      |p AS (SELECT q_id, a.vec_id AS n_id,
      |        list_sum(list_transform(q_emb,
      |          (x,i) -> CAST(x AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE))) /
      |        (sqrt(list_sum(list_transform(q_emb,
      |           x -> CAST(x AS DOUBLE) * x))) *
      |         sqrt(list_sum(list_transform(a.embedding,
      |           x -> CAST(x AS DOUBLE) * x)))) AS cos_raw
      |      FROM a JOIN q ON a.cell = q.cell AND a.vec_id <> q.q_id)
      |SELECT q_id, n_id, round(cos_raw, 6) AS cosine,
      |       row_number() OVER (PARTITION BY q_id
      |         ORDER BY cos_raw DESC, n_id) AS rk
      |FROM p QUALIFY rk <= 5 ORDER BY q_id, rk""")

  /** Per-vector int8 quantization — the storage/bandwidth op for serving
    * embeddings at scale (4× smaller than f32, enough for recall-oriented
    * ANN): min-max affine scale to 0..255 plus the per-vector scale and
    * zero-point needed to dequantize. Pure per-row expression work, no
    * shuffle at all; both engines compute the identical IEEE-double
    * affine map, so the integer codes are oracle-exact. */
  private val q62Quantize = QueryDef(
    (s, dir) => {
      val e = Tables(s, dir, "embeddings")
      val mn = array_min(col("embedding")).cast("double")
      val mx = array_max(col("embedding")).cast("double")
      val scale = (mx - mn) / 255.0
      // exploded scalar rows (vec_id, dim, qcode) rather than a list
      // column: every code is individually oracle-checked and the output
      // schema stays arrow-plain for the driver compare. A constant vector
      // makes scale 0 and the engines' x/0 semantics diverge (Spark NULL
      // vs DuckDB IEEE), so the affine map is guarded to qcode=0.
      e.select(col("vec_id"),
          posexplode(transform(col("embedding"), x =>
            when(mx === mn, lit(0))
              .otherwise(round((x.cast("double") - mn) / scale, 0))
              .cast("int")))
            .as(Seq("dim", "qcode")),
          mn.as("zero_point"), scale.as("scale"))
        .orderBy("vec_id", "dim")
    },
    """SELECT vec_id, CAST(i - 1 AS INTEGER) AS dim,
      |  CASE WHEN list_max(embedding) = list_min(embedding) THEN 0
      |  ELSE CAST(round(
      |    (CAST(embedding[i] AS DOUBLE) - CAST(list_min(embedding) AS DOUBLE)) /
      |    ((CAST(list_max(embedding) AS DOUBLE) -
      |      CAST(list_min(embedding) AS DOUBLE)) / 255.0)) AS INTEGER) END
      |    AS qcode,
      |  CAST(list_min(embedding) AS DOUBLE) AS zero_point,
      |  (CAST(list_max(embedding) AS DOUBLE) -
      |   CAST(list_min(embedding) AS DOUBLE)) / 255.0 AS scale
      |FROM embeddings, UNNEST(generate_series(1, len(embedding))) t(i)
      |ORDER BY vec_id, dim""")

  val defs: Map[String, QueryDef] = Map(
    "q34_knn_cosine" -> q34KnnBrute,
    "q35_knn_lsh" -> q35KnnLsh,
    "q59_knn_ivf" -> q59KnnIvf,
    "q62_embedding_quantize" -> q62Quantize,
  )
}
