package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.QueryDef

/** Multimodal columns for training-data pipelines (north star): media
  * payloads are opaque BINARY columns with a typed metadata struct; the
  * compute-heavy steps (decode, feature-extract, resize, frame-sample)
  * run as partition-batched transforms over typed Datasets — the Scala
  * analog of mapInPandas batch UDFs: one codec instance per partition,
  * amortized across the batch, never per row.
  *
  * The actual codecs (image/audio libraries) are not available in this
  * environment, so decoding is STUBBED behind [[MediaCodec]] with a
  * deterministic fake ([[FakeCodec]]); the Spark-side plumbing — schema,
  * partitioning, batch shape, binary handling — is real and tested.
  * Swapping in a JNI/FFmpeg-backed codec is a one-class change.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("media_type", StringType),   // image | audio | video
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType),
      StructField("codec", StringType)))),
    StructField("content", BinaryType)))

  /** Pluggable decode surface. Implementations must be Serializable —
    * they ship to executors and are instantiated once per partition. */
  trait MediaCodec extends Serializable {
    /** Decode + featurize a payload into a fixed-width embedding. */
    def features(meta: Row, content: Array[Byte]): Array[Float]
    /** Re-encode the payload at a new resolution. */
    def resize(meta: Row, content: Array[Byte], w: Int, h: Int): Array[Byte]
    /** Sample video frames every `everyMs` milliseconds. */
    def sampleFrames(meta: Row, content: Array[Byte], everyMs: Long): Seq[Array[Byte]]
  }

  /** Deterministic fake codec: all outputs are pure functions of the
    * payload bytes, so tests and oracle-style checks are reproducible.
    * A real implementation would replace the bodies with actual
    * image/audio decoding (??? territory in this container). */
  object FakeCodec extends MediaCodec {
    def features(meta: Row, content: Array[Byte]): Array[Float] = {
      val dim = 16
      val acc = new Array[Float](dim)
      var i = 0
      while (i < content.length) {
        acc(i % dim) += (content(i) & 0xff) / 255.0f
        i += 1
      }
      acc
    }
    def resize(meta: Row, content: Array[Byte], w: Int, h: Int): Array[Byte] = {
      // fake: proportional byte resample (truncate/cycle) to w*h bytes
      val out = new Array[Byte](w * h)
      if (content.nonEmpty) {
        var i = 0
        while (i < out.length) { out(i) = content(i % content.length); i += 1 }
      }
      out
    }
    def sampleFrames(meta: Row, content: Array[Byte], everyMs: Long): Seq[Array[Byte]] = {
      val duration = meta.getAs[Long]("duration_ms")
      val nFrames = math.max(1, (duration / math.max(everyMs, 1L)).toInt)
      val frameSize = math.max(1, content.length / math.max(nFrames, 1))
      content.grouped(frameSize).take(nFrames).map(_.toArray).toSeq
    }
  }

  /** Deterministic synthetic media table (the container has no real
    * media): payload bytes are a pure function of media_id. Rows are
    * materialized on the EXECUTORS (range → map), not the driver, so the
    * fixture generator itself scales with n. */
  def synthesize(spark: SparkSession, n: Int, partitions: Int = 4): DataFrame = {
    val rdd = spark.sparkContext
      .range(0L, n.toLong, numSlices = partitions)
      .map { id =>
        val i = id.toInt
        val mt = Seq("image", "audio", "video")(i % 3)
        val content = Array.tabulate[Byte](64 + (i % 192))(j => ((i * 31 + j * 7) % 256).toByte)
        Row(id, Row(mt, 64 + i % 64, 48 + i % 48, 1000L * (1 + i % 10), "fake"), content)
      }
    spark.createDataFrame(rdd, mediaSchema)
  }

  /** Scale-factor-proportional fixture: one media row per `documents`
    * row, so q53/q54/q60 measure 10× the codec work at 10× the sf (the
    * parquet count() is statistics-only — no data scan). The DuckDB
    * oracles derive the same row set from documents via row_number(). */
  def mediaFixture(spark: SparkSession, dir: String): DataFrame = {
    val n = graft.core.Tables(spark, dir, "documents").count()
    require(n <= Int.MaxValue,
      s"mediaFixture generates one media row per document; $n documents " +
        "exceeds the Int-sized fixture bound (synthesize takes an Int)")
    synthesize(spark, n.toInt)
  }

  /** Shared oracle-SQL prelude: media_id/len re-derived from documents. */
  private val oracleIds =
    """SELECT CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS i
      |             FROM documents""".stripMargin

  private val featureSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType),
    StructField("embedding", ArrayType(FloatType))))

  /** Decode→featurize: one codec per partition, batch-amortized — the
    * mapInPandas shape. Output is (media_id, media_type, embedding),
    * ready for the similarity operators (graft.ext.Similarity). */
  def extractFeatures(media: DataFrame, codec: MediaCodec): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "meta", "content").rdd
      .mapPartitions { rows =>
        // per-partition init point (a real codec opens its library here)
        rows.map { r =>
          val meta = r.getStruct(1)
          Row(r.getLong(0), meta.getAs[String]("media_type"),
            codec.features(meta, r.getAs[Array[Byte]]("content")))
        }
      }
    spark.createDataFrame(rdd, featureSchema)
  }

  private val resizedSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("content", BinaryType)))

  def resizeAll(media: DataFrame, codec: MediaCodec, w: Int, h: Int): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "meta", "content").rdd
      .mapPartitions { rows =>
        rows.map { r =>
          Row(r.getLong(0),
            codec.resize(r.getStruct(1), r.getAs[Array[Byte]]("content"), w, h))
        }
      }
    spark.createDataFrame(rdd, resizedSchema)
  }

  private val frameSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_no", IntegerType, nullable = false),
    StructField("frame", BinaryType)))

  /** Frame sampling explodes one video row into many frame rows — the
    * generator/UDTF shape (flatMap over partitions). */
  def sampleFrames(media: DataFrame, codec: MediaCodec, everyMs: Long): DataFrame = {
    val spark = media.sparkSession
    val rdd = media
      .filter(col("meta.media_type") === "video")
      .select("media_id", "meta", "content").rdd
      .mapPartitions { rows =>
        rows.flatMap { r =>
          codec.sampleFrames(r.getStruct(1), r.getAs[Array[Byte]]("content"), everyMs)
            .zipWithIndex.map { case (f, i) => Row(r.getLong(0), i, f) }
        }
      }
    spark.createDataFrame(rdd, frameSchema)
  }

  // ---- driver-checked queries --------------------------------------------
  //
  // FakeCodec is pure byte arithmetic over `synthesize`'s deterministic
  // payloads, so both queries have exact DuckDB oracles: the SQL re-derives
  // the payload bytes from media_id via generate_series and reproduces the
  // codec's arithmetic in integer space.

  /** Decode→featurize, checked end-to-end: run the real partition-batched
    * codec path, then recover the integer per-dim byte sums from the float
    * embedding (feature = byteSum/255 accumulated in f32; the accumulated
    * error is ≤1e-4·255 ≪ 0.5, so round(f·255) is the exact integer). */
  private val q53MediaFeatures = QueryDef(
    (s, dir) => {
      val feats = extractFeatures(mediaFixture(s, dir), FakeCodec)
      feats
        .select(col("media_id"), col("media_type"),
          posexplode(col("embedding")).as(Seq("dim", "f")))
        .select(col("media_id"), col("media_type"), col("dim"),
          round(col("f").cast("double") * 255, 0).cast("long").as("byte_sum"))
        .orderBy("media_id", "dim")
    },
    s"""WITH ids AS ($oracleIds),
      |m AS (SELECT i AS media_id, 64 + i % 192 AS len FROM ids),
      |b AS (SELECT media_id, (media_id * 31 + j * 7) % 256 AS bv,
      |             CAST(j % 16 AS INTEGER) AS dim
      |      FROM m, UNNEST(generate_series(0, len - 1)) t(j))
      |SELECT media_id,
      |       CASE media_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
      |            ELSE 'video' END AS media_type,
      |       dim, CAST(sum(bv) AS BIGINT) AS byte_sum
      |FROM b GROUP BY 1, 2, 3 ORDER BY media_id, dim""")

  /** Video frame sampling, checked end-to-end: nFrames = duration/everyMs
    * and frameSize = floor(len/nFrames), so nFrames·frameSize ≤ len and
    * every emitted frame is exactly frameSize bytes — integer-exact in
    * DuckDB. */
  private val q54MediaFrames = QueryDef(
    (s, dir) =>
      sampleFrames(mediaFixture(s, dir), FakeCodec, 500L)
        .select(col("media_id"), col("frame_no"),
          length(col("frame")).cast("long").as("frame_bytes"))
        .orderBy("media_id", "frame_no"),
    s"""WITH ids AS ($oracleIds),
      |v AS (SELECT i AS media_id,
      |             64 + i % 192 AS len, 2 * (1 + i % 10) AS nf
      |      FROM ids WHERE i % 3 = 2)
      |SELECT media_id, CAST(j AS INTEGER) AS frame_no,
      |       CAST(len // nf AS BIGINT) AS frame_bytes
      |FROM v, UNNEST(generate_series(0, nf - 1)) t(j)
      |ORDER BY media_id, frame_no""")

  /** Resize, checked end-to-end: every payload is re-encoded at 8×8
    * (64 bytes; all payloads are ≥64 bytes so the fake resample never
    * cycles) and summarized as an integer byte checksum the oracle
    * re-derives arithmetically. The summary is computed in the same
    * partition-batched pass — binary payloads never need a SQL-side
    * byte-extraction detour. */
  private val q60MediaResize = QueryDef(
    (s, dir) => {
      val resized = resizeAll(mediaFixture(s, dir), FakeCodec, 8, 8)
      val rdd = resized.rdd.map { r =>
        val bytes = r.getAs[Array[Byte]]("content")
        Row(r.getLong(0), bytes.length,
          bytes.foldLeft(0L)((a, b) => a + (b & 0xff)))
      }
      resized.sparkSession.createDataFrame(rdd, StructType(Seq(
        StructField("media_id", LongType, nullable = false),
        StructField("resized_bytes", IntegerType, nullable = false),
        StructField("byte_sum", LongType, nullable = false))))
        .orderBy("media_id")
    },
    s"""WITH ids AS ($oracleIds),
      |m AS (SELECT i AS media_id, 64 + i % 192 AS len FROM ids)
      |SELECT media_id, CAST(64 AS INTEGER) AS resized_bytes,
      |       CAST(sum((media_id * 31 + (j % len) * 7) % 256) AS BIGINT)
      |         AS byte_sum
      |FROM m, UNNEST(generate_series(0, 63)) t(j)
      |GROUP BY media_id ORDER BY media_id""")

  val defs: Map[String, QueryDef] = Map(
    "q53_media_features" -> q53MediaFeatures,
    "q54_media_frames" -> q54MediaFrames,
    "q60_media_resize" -> q60MediaResize,
  )
}
