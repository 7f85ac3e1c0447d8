package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Conflict-SCOPED commit recovery: a writer that loses the manifest
  * race to a winner whose changes touched only DISJOINT buckets must
  * re-commit its already-written epoch by re-listing it against the
  * new head — NO second data write — while an overlapping race (or
  * any concurrent metadata change) still re-runs the verb body in
  * full. The counters graded here are the spec hooks
  * [[MergeTable.epochWrites]] / [[MergeTable.fastRecommits]]; the
  * ScaleProbe conflict leg prices the same property in bytes. */
class ConflictScopeSpec extends SparkSpec {

  /** 16-bucket table over 200 keys so both a same-bucket pair and a
    * cross-bucket pair of keys exist deterministically. */
  private def mkTable(): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-cscope")
      .resolve("t").toString
    val df = (1 to 200).map(i => (i.toLong, s"v$i")).toDF("key", "value")
    MergeTable.create(df, dir, "key", hexDigits = 1)
    dir
  }

  private def keyBuckets(dir: String): Map[Long, String] =
    MergeTable.readTable(spark, dir).select("key", "bucket")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  private def valueOf(dir: String, key: Long,
      version: Option[Long] = None): String =
    MergeTable.readTable(spark, dir, version)
      .filter(col("key") === key).select("value")
      .collect().head.getString(0)

  private def epochDirs(dir: String): Seq[String] = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/data"))
      .filter(_.isDirectory).map(_.getPath.getName).toSeq.sorted
  }

  test("disjoint-bucket race: the loser re-commits its epoch against " +
      "the winner's head without a second data write; both writes " +
      "land, history is linear, no orphans") {
    import spark.implicits._
    val dir = mkTable()
    val kb = keyBuckets(dir)
    // two existing keys in DIFFERENT buckets
    val (keyA, keyB) = {
      val a = kb.keys.min
      (a, kb.keys.filter(k => kb(k) != kb(a)).min)
    }
    val w0 = MergeTable.epochWrites.get()
    val f0 = MergeTable.fastRecommits.get()
    var fired = false
    val stA = MergeTable.upsertWithHook(spark, dir,
      Seq((keyA, "A2")).toDF("key", "value"), () => {
        if (!fired) { // once: the retry path must not re-race itself
          fired = true
          MergeTable.upsert(spark, dir,
            Seq((keyB, "B2")).toDF("key", "value")): Unit
        }
      })
    // B won version 2; A's fast path re-listed its attempt as v3
    assert(stA.version === 3L,
      "the loser must report the version it ACTUALLY committed")
    assert(MergeTable.epochWrites.get() - w0 === 2L,
      "a disjoint-bucket race loser must NOT rewrite its epoch")
    assert(MergeTable.fastRecommits.get() - f0 === 1L)
    // both writes visible at head; nothing else changed
    assert(valueOf(dir, keyA) === "A2")
    assert(valueOf(dir, keyB) === "B2")
    assert(MergeTable.readTable(spark, dir).count() === 200L)
    // the winner's snapshot shows only the winner's write
    assert(valueOf(dir, keyA, Some(2L)) === s"v$keyA")
    assert(valueOf(dir, keyB, Some(2L)) === "B2")
    // the relinked epoch answers to its COMMITTED version's name
    assert(epochDirs(dir).count(_.startsWith("v=3-")) === 1)
    assert(epochDirs(dir).forall(d => !d.contains("v=2-") ||
      d.startsWith("v=2-")), "no stale attempt names")
    val rep = MergeTable.fsck(spark, dir)
    assert(rep.orphans === 0L && rep.missing === 0L)
    // the changefeed sees exactly the loser's bucket change in v2->v3
    val diff = MergeTable.changes(spark, dir, 2L, 3L)
    assert(diff.select("key").collect().map(_.getLong(0)).toSeq ===
      Seq(keyA))
  }

  test("overlapping-bucket race re-runs the body in full (second " +
      "epoch write), and the merged result is exact") {
    import spark.implicits._
    val dir = mkTable()
    val kb = keyBuckets(dir)
    // two DIFFERENT existing keys in the SAME bucket
    val (keyA, keyB) = kb.groupBy(_._2).values
      .find(_.size >= 2).map(_.keys.toSeq.sorted)
      .map(ks => (ks(0), ks(1))).get
    val w0 = MergeTable.epochWrites.get()
    val f0 = MergeTable.fastRecommits.get()
    var fired = false
    val stA = MergeTable.upsertWithHook(spark, dir,
      Seq((keyA, "A2")).toDF("key", "value"), () => {
        if (!fired) {
          fired = true
          MergeTable.upsert(spark, dir,
            Seq((keyB, "B2")).toDF("key", "value")): Unit
        }
      })
    assert(stA.version === 3L)
    assert(MergeTable.fastRecommits.get() - f0 === 0L,
      "an overlapping race must NOT take the fast path")
    assert(MergeTable.epochWrites.get() - w0 === 3L,
      "the overlapping loser re-runs its body: write, lose, rewrite")
    // the full retry re-read the winner's bucket state: BOTH updates
    // survive in the shared bucket
    assert(valueOf(dir, keyA) === "A2")
    assert(valueOf(dir, keyB) === "B2")
    assert(MergeTable.readTable(spark, dir).count() === 200L)
    val rep = MergeTable.fsck(spark, dir)
    assert(rep.orphans === 0L && rep.missing === 0L)
  }

  test("a concurrent metadata change (table property) disqualifies " +
      "the fast path even when buckets are disjoint") {
    import spark.implicits._
    val dir = mkTable()
    val kb = keyBuckets(dir)
    val keyA = kb.keys.min
    val f0 = MergeTable.fastRecommits.get()
    var fired = false
    val stA = MergeTable.upsertWithHook(spark, dir,
      Seq((keyA, "A2")).toDF("key", "value"), () => {
        if (!fired) {
          fired = true
          MergeTable.setProperties(spark, dir,
            Map("graft.test.flag" -> "on")): Unit
        }
      })
    assert(stA.version === 3L)
    assert(MergeTable.fastRecommits.get() - f0 === 0L,
      "a props change must force the full re-plan")
    assert(valueOf(dir, keyA) === "A2")
    // the re-planned commit carries the winner's property forward
    assert(MergeTable.properties(spark, dir)
      .get("graft.test.flag").contains("on"))
  }

  test("a constraint added during the race window disqualifies the " +
      "fast path (the loser re-enforces on retry)") {
    import spark.implicits._
    val dir = mkTable()
    val kb = keyBuckets(dir)
    val (keyA, keyB) = {
      val a = kb.keys.min
      (a, kb.keys.filter(k => kb(k) != kb(a)).min)
    }
    val f0 = MergeTable.fastRecommits.get()
    var fired = false
    val stA = MergeTable.upsertWithHook(spark, dir,
      Seq((keyA, "A2")).toDF("key", "value"), () => {
        if (!fired) {
          fired = true
          // winner commits a disjoint write AND declares a constraint
          MergeTable.upsert(spark, dir,
            Seq((keyB, "B2")).toDF("key", "value")): Unit
          MergeTable.addConstraint(spark, dir, "vlen",
            "length(value) >= 1")
        }
      })
    assert(stA.version >= 3L)
    assert(MergeTable.fastRecommits.get() - f0 === 0L,
      "a changed constraint set must force the full retry, which " +
        "re-enforces against the batch")
    assert(valueOf(dir, keyA) === "A2")
    assert(valueOf(dir, keyB) === "B2")
  }

  test("double race: the fast path revalidates against each new head " +
      "(two disjoint winners), still one data write for the loser") {
    import spark.implicits._
    val dir = mkTable()
    val kb = keyBuckets(dir)
    val keyA = kb.keys.min
    val others = kb.keys.filter(k => kb(k) != kb(keyA)).toSeq.sorted
    val (keyB, keyC) = (others(0), others.find(k =>
      kb(k) != kb(others(0))).get)
    val w0 = MergeTable.epochWrites.get()
    val f0 = MergeTable.fastRecommits.get()
    var fired = false
    val stA = MergeTable.upsertWithHook(spark, dir,
      Seq((keyA, "A2")).toDF("key", "value"), () => {
        if (!fired) {
          fired = true
          MergeTable.upsert(spark, dir,
            Seq((keyB, "B2")).toDF("key", "value")): Unit
          MergeTable.upsert(spark, dir,
            Seq((keyC, "C2")).toDF("key", "value")): Unit
        }
      })
    assert(stA.version === 4L)
    assert(MergeTable.epochWrites.get() - w0 === 3L,
      "three upserts, three epoch writes — the loser never rewrote")
    assert(MergeTable.fastRecommits.get() - f0 === 1L)
    assert(valueOf(dir, keyA) === "A2")
    assert(valueOf(dir, keyB) === "B2")
    assert(valueOf(dir, keyC) === "C2")
    assert(MergeTable.fsck(spark, dir).orphans === 0L)
  }
}
