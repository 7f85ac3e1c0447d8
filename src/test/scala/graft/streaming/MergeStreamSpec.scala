package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class CdcRow(key: Long, value: String)

/** MergeStream: a change stream drained batch-by-batch into the
  * copy-on-write table — later batches win on overlapping keys, and
  * the restart drains only the new data. */
class MergeStreamSpec extends SparkSpec {

  test("two drains apply latest-wins upserts; state matches the " +
      "change log's final word per key") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("merge-stream").toString + "/t"
    val ckpt = Files.createTempDirectory("merge-ckpt").toString
    graft.ext.MergeTable.create(
      (1L to 20L).map(i => CdcRow(i, s"v$i")).toDF(), dir, "key")
    val input = MemoryStream[CdcRow]

    input.addData(CdcRow(3, "b0"), CdcRow(21, "b0-ins"))
    MergeStream.start(input.toDF(), dir, ckpt).awaitTermination()
    // restart: a second batch moves key 3 AGAIN and touches key 7
    input.addData(CdcRow(3, "b1"), CdcRow(7, "b1"))
    MergeStream.start(input.toDF(), dir, ckpt).awaitTermination()

    val t = graft.ext.MergeTable.readTable(spark, dir)
    assert(t.count() === 21L)
    val got = t.filter(col("key").isin(3L, 7L, 21L))
      .select("key", "value").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(3L -> "b1", 7L -> "b1", 21L -> "b0-ins"))
  }
}
