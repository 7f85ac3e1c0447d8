package graft.ext

import org.apache.spark.sql.types._
import graft.SparkSpec
import graft.ext.Multimodal._

class MultimodalSpec extends SparkSpec {

  test("synthetic media table has the binary + typed-metadata schema") {
    val m = synthesize(spark, 30)
    assert(m.schema("content").dataType == BinaryType)
    assert(m.schema("meta").dataType.isInstanceOf[StructType])
    assert(m.count() == 30)
    val types = m.select("meta.media_type").distinct()
      .collect().map(_.getString(0)).toSet
    assert(types == Set("image", "audio", "video"))
  }

  test("feature extraction is deterministic and fixed-width") {
    val m = synthesize(spark, 12)
    val f1 = extractFeatures(m, FakeCodec).orderBy("media_id").collect()
    val f2 = extractFeatures(m, FakeCodec).orderBy("media_id").collect()
    assert(f1.length == 12)
    for ((a, b) <- f1.zip(f2)) {
      assert(a.getLong(0) == b.getLong(0))
      assert(a.getSeq[Float](2) == b.getSeq[Float](2))
      assert(a.getSeq[Float](2).length == 16)
    }
  }

  test("feature output joins back to the similarity surface") {
    val feats = extractFeatures(synthesize(spark, 10), FakeCodec)
    assert(feats.schema("embedding").dataType == ArrayType(FloatType))
    // usable by the same higher-order cosine expressions as q34
    import org.apache.spark.sql.functions._
    val withNorm = feats.withColumn("l2",
      sqrt(aggregate(transform(col("embedding"),
        x => x.cast("double") * x.cast("double")),
        lit(0.0), (acc, x) => acc + x)))
    assert(withNorm.filter(col("l2") > 0).count() == 10)
  }

  test("resize produces exactly w*h bytes and preserves partitioning") {
    val m = synthesize(spark, 20, partitions = 5)
    val resized = resizeAll(m, FakeCodec, 8, 6)
    assert(resized.rdd.getNumPartitions == 5) // narrow op: no shuffle
    val lens = resized.collect().map(_.getAs[Array[Byte]]("content").length)
    assert(lens.forall(_ == 48))
  }

  test("frame sampling explodes videos into frame rows") {
    val m = synthesize(spark, 30)
    val frames = sampleFrames(m, FakeCodec, everyMs = 1000)
    val nVideos = m.filter("meta.media_type = 'video'").count()
    assert(frames.count() >= nVideos) // every video yields >= 1 frame
    assert(frames.schema("frame").dataType == BinaryType)
    // frame_no is dense from 0 per media_id
    val byId = frames.collect().groupBy(_.getLong(0))
    for ((_, rs) <- byId)
      assert(rs.map(_.getInt(1)).sorted.toSeq == (0 until rs.length))
  }
}
