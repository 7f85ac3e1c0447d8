package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** CHECK constraints: declared once (existing data validated, the
  * Delta ADD CONSTRAINT contract), enforced on exactly the rows each
  * upsert/merge is about to write, SQL CHECK null semantics, atomic
  * rejection (nothing commits), immutable add/drop lifecycle. */
class ConstraintSpec extends SparkSpec {

  private def mkTable(n: Int = 30): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-chk")
      .resolve("t").toString
    MergeTable.create(
      (1 to n).map(i => (i.toLong, i * 10L, s"v$i"))
        .toDF("key", "cents", "value"), dir, "key")
    dir
  }

  test("a violating upsert is rejected ATOMICALLY with per-constraint " +
      "counts — no version commits, and a clean retry applies; " +
      "deleteKeys and layout ops stay constraint-free") {
    import spark.implicits._
    val dir = mkTable()
    MergeTable.addConstraint(spark, dir, "cents_nonneg", "cents >= 0")
    MergeTable.addConstraint(spark, dir, "value_present",
      "length(value) > 0")
    val err = intercept[IllegalStateException] {
      MergeTable.upsert(spark, dir,
        Seq((3L, -5L, "x"), (4L, -6L, "y"), (5L, 7L, ""))
          .toDF("key", "cents", "value"))
    }
    assert(err.getMessage.contains("cents_nonneg (cents >= 0): 2 row(s)"))
    assert(err.getMessage.contains("value_present"))
    assert(MergeTable.versions(spark, dir) === Seq(1L),
      "a rejected batch must commit nothing")
    assert(MergeTable.fsck(spark, dir).orphans === 0L,
      "rejection happens BEFORE the epoch write — no stranded files")
    val st = MergeTable.upsert(spark, dir,
      Seq((3L, 5L, "ok")).toDF("key", "cents", "value"))
    assert(st.version === 2L)
    // hard deletes and layout maintenance never consult constraints
    MergeTable.deleteKeys(spark, dir, Seq(4L).toDF("key")): Unit
    MergeTable.optimize(spark, dir, "cents"): Unit
    assert(MergeTable.readTable(spark, dir).count() === 29L)
  }

  test("merge enforces constraints on its SURVIVORS — a clause " +
      "UPDATE that would break the invariant aborts the whole merge") {
    import spark.implicits._
    val dir = mkTable(10)
    MergeTable.addConstraint(spark, dir, "cents_nonneg", "cents >= 0")
    val err = intercept[IllegalStateException] {
      MergeTable.merge(spark, dir,
        Seq((4L, 0L, "z")).toDF("key", "cents", "value"),
        matched = Seq(MergeTable.MergeWhen(None,
          MergeTable.MergeAction.Update(
            Map("cents" -> (col("tgt.cents") - lit(1000L)))))))
    }
    assert(err.getMessage.contains("merge") &&
      err.getMessage.contains("cents_nonneg"))
    assert(MergeTable.versions(spark, dir) === Seq(1L))
    // the same clause with a non-violating delta applies
    MergeTable.merge(spark, dir,
      Seq((4L, 0L, "z")).toDF("key", "cents", "value"),
      matched = Seq(MergeTable.MergeWhen(None,
        MergeTable.MergeAction.Update(
          Map("cents" -> (col("tgt.cents") - lit(10L))))))): Unit
    assert(MergeTable.readTable(spark, dir).filter(col("key") === 4L)
      .select("cents").collect().head.getLong(0) === 30L)
  }

  test("SQL CHECK null semantics: a constraint over a column older " +
      "rows never stored passes them (extend-only evolution survives " +
      "a later invariant)") {
    import spark.implicits._
    val dir = mkTable(10)
    // extend the schema first: only key 3 carries `score`
    MergeTable.upsert(spark, dir,
      Seq((3L, 30L, "v3", 5L)).toDF("key", "cents", "value", "score"))
    // the invariant on the new column: NULL (old rows) must pass both
    // the existing-data validation and every later write
    MergeTable.addConstraint(spark, dir, "score_pos", "score > 0")
    MergeTable.upsert(spark, dir,
      Seq((4L, 40L, "v4b")).toDF("key", "cents", "value")): Unit
    val err = intercept[IllegalStateException] {
      MergeTable.upsert(spark, dir,
        Seq((5L, 50L, "v5b", -1L))
          .toDF("key", "cents", "value", "score"))
    }
    assert(err.getMessage.contains("score_pos (score > 0): 1 row(s)"))
  }

  test("lifecycle: existing-data validation rejects a bad ADD; " +
      "immutable add/drop; torn files fail loudly by name") {
    import spark.implicits._
    val dir = mkTable(10)
    MergeTable.upsert(spark, dir,
      Seq((7L, -70L, "neg")).toDF("key", "cents", "value"))
    val bad = intercept[IllegalArgumentException] {
      MergeTable.addConstraint(spark, dir, "cents_nonneg", "cents >= 0")
    }
    assert(bad.getMessage.contains("does not hold") &&
      bad.getMessage.contains("1 row(s)"))
    assert(MergeTable.constraints(spark, dir) === Map.empty)
    MergeTable.upsert(spark, dir,
      Seq((7L, 70L, "fixed")).toDF("key", "cents", "value"))
    MergeTable.addConstraint(spark, dir, "cents_nonneg", "cents >= 0")
    assert(intercept[IllegalArgumentException] {
      MergeTable.addConstraint(spark, dir, "cents_nonneg", "cents > 5")
    }.getMessage.contains("immutable"))
    assert(MergeTable.dropConstraint(spark, dir, "cents_nonneg"))
    assert(!MergeTable.dropConstraint(spark, dir, "cents_nonneg"))
    MergeTable.addConstraint(spark, dir, "cents_nonneg", "cents >= 0")
    assert(MergeTable.constraints(spark, dir) ===
      Map("cents_nonneg" -> "cents >= 0"))
    // torn constraint file: loud, named, actionable
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val torn = new org.apache.hadoop.fs.Path(s"$dir/_constraints/torn")
    fs.create(torn, true).close()
    assert(intercept[IllegalStateException] {
      MergeTable.constraints(spark, dir)
    }.getMessage.contains("torn constraint file"))
    fs.delete(torn, false)
    assert(intercept[IllegalArgumentException] {
      MergeTable.addConstraint(spark, dir, "../esc", "cents >= 0")
    }.getMessage.contains("must match"))
  }
}
