package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Ivm delta algebra in isolation: retraction moves weight between
  * groups, a group emptied by deletes cancels out of the serve, and
  * replaying an increment's run partition is idempotent. */
class IvmSpec extends SparkSpec {

  test("retract+assert deltas reproduce the direct aggregate, " +
      "including group migration and emptied-group cancellation") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ivm")
      .resolve("v").toString
    // base: A={10,20}, B={5}
    Ivm.init(Seq(("A", 10L), ("A", 20L), ("B", 5L))
      .toDF("status", "cents"), dir)
    // increment: migrate one A row (10) to C at 12; delete B's only row
    val cf = Seq(
      (1L, "A", java.lang.Long.valueOf(10L), "C",
        java.lang.Long.valueOf(12L)),
      (2L, "B", java.lang.Long.valueOf(5L), null.asInstanceOf[String],
        null.asInstanceOf[java.lang.Long]))
      .toDF("key", "os", "oc", "ns", "nc")
      .select(col("key"),
        when(col("os").isNotNull, struct(col("os").as("status"),
          col("oc").as("cents"))).as("old_row"),
        when(col("ns").isNotNull, struct(col("ns").as("status"),
          col("nc").as("cents"))).as("new_row"))
    Ivm.applyChanges(cf, dir, 1)
    Ivm.applyChanges(cf, dir, 1) // replay: run overwrite, not append
    val got = Ivm.serve(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set(("A", 1L, 20L), ("C", 1L, 12L)),
      s"delta algebra broke: $got")
  }
}
