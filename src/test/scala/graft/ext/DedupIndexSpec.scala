package graft.ext

import java.nio.file.Files

import graft.SparkSpec

class DedupIndexSpec extends SparkSpec {

  private def doc(id: Long, text: String): (Long, String) = (id, text)

  test("cross-run dedup: a later batch's re-crawl of known content is rejected") {
    import spark.implicits._
    val idx = Files.createTempDirectory("dedup-idx").toString

    // run 1: two distinct docs, one in-batch duplicate (id 3 repeats id 1)
    val r1 = DedupIndex.admit(spark, idx, Seq(
      doc(1, "alpha beta gamma"), doc(2, "delta epsilon"),
      doc(3, "alpha beta gamma")).toDF("doc_id", "text"))
    assert(r1.select("doc_id").collect().map(_.getLong(0)).sorted
      .toSeq == Seq(1L, 2L)) // 3 collapsed onto 1 within the batch

    // run 2: doc 2's text re-crawled under a new id + one genuinely new doc
    val r2 = DedupIndex.admit(spark, idx, Seq(
      doc(10, "delta epsilon"), doc(11, "zeta eta")).toDF("doc_id", "text"))
    assert(r2.select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(11L))

    // the index now holds exactly the three distinct fingerprints, with
    // first-seen canonical ids
    val index = DedupIndex.readIndex(spark, idx).collect()
      .map(r => r.getAs[String]("fp") -> r.getAs[Long]("canonical_id")).toMap
    assert(index.size == 3)
    assert(index.values.toSet == Set(1L, 2L, 11L))
  }

  test("admission cost shape: a fully-duplicate batch admits nothing and appends nothing") {
    import spark.implicits._
    val idx = Files.createTempDirectory("dedup-idx2").toString
    DedupIndex.admit(spark, idx,
      Seq(doc(1, "one"), doc(2, "two")).toDF("doc_id", "text"))
    val before = DedupIndex.readIndex(spark, idx).count()
    val r = DedupIndex.admit(spark, idx,
      Seq(doc(5, "one"), doc(6, "two")).toDF("doc_id", "text"))
    assert(r.isEmpty)
    assert(DedupIndex.readIndex(spark, idx).count() == before)
  }

  test("fresh index dir: everything admits, index bootstraps") {
    import spark.implicits._
    val idx = Files.createTempDirectory("dedup-idx3").toString
    assert(DedupIndex.readIndex(spark, idx).isEmpty)
    val r = DedupIndex.admit(spark, idx,
      Seq(doc(7, "seven")).toDF("doc_id", "text"))
    assert(r.count() == 1)
    assert(DedupIndex.readIndex(spark, idx).count() == 1)
  }

  test("compact: content invariant (exact multiset), file count bounded, " +
      "post-compact admissions unchanged") {
    import spark.implicits._
    val idx = Files.createTempDirectory("dedup-idx4").toString
    // decay the index the way an hourly cron does: three appends
    DedupIndex.admit(spark, idx,
      Seq(doc(1, "one"), doc(2, "two")).toDF("doc_id", "text"))
    DedupIndex.admit(spark, idx,
      Seq(doc(3, "three"), doc(4, "four")).toDF("doc_id", "text"))
    DedupIndex.admit(spark, idx,
      Seq(doc(5, "five")).toDF("doc_id", "text"))
    val before = DedupIndex.readIndex(spark, idx).collect()
      .map(r => (r.getAs[String]("fp"), r.getAs[Long]("canonical_id")))
      .sorted.toSeq
    val filesBefore = DedupIndex.dataFileCount(spark, idx)
    DedupIndex.compact(spark, idx)
    val after = DedupIndex.readIndex(spark, idx).collect()
      .map(r => (r.getAs[String]("fp"), r.getAs[Long]("canonical_id")))
      .sorted.toSeq
    assert(after == before, "compaction changed index CONTENT")
    val filesAfter = DedupIndex.dataFileCount(spark, idx)
    assert(filesAfter <= spark.sparkContext.defaultParallelism,
      s"compaction left $filesAfter files")
    assert(filesAfter <= filesBefore)
    // the compacted index still rejects known content and admits new
    val r = DedupIndex.admit(spark, idx,
      Seq(doc(10, "one"), doc(11, "brand new")).toDF("doc_id", "text"))
    assert(r.select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(11L))
  }

  test("compact on a missing index dir is a no-op") {
    DedupIndex.compact(spark,
      s"/tmp/graft-missing-idx-${System.nanoTime()}")
  }

  test("forget removes ONLY tombstoned fingerprints, keeps rejecting " +
      "survivors' duplicates, and lets forgotten content re-admit fresh") {
    import spark.implicits._
    val idx = Files.createTempDirectory("dedup-idx-forget").toString
    DedupIndex.admit(spark, idx, Seq(
      doc(1, "keep me"), doc(2, "forget me"), doc(3, "also keep"))
      .toDF("doc_id", "text"))
    DedupIndex.forget(spark, idx, Seq(2L).toDF("doc_id"))

    val after = DedupIndex.readIndex(spark, idx).collect()
      .map(_.getAs[Long]("canonical_id")).toSet
    assert(after == Set(1L, 3L), s"index after forget: $after")

    // a surviving canonical still rejects its re-crawl; the forgotten
    // text re-admits under a NEW canonical id
    val r = DedupIndex.admit(spark, idx, Seq(
      doc(10, "keep me"), doc(11, "forget me")).toDF("doc_id", "text"))
    assert(r.select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(11L))
    val finalIds = DedupIndex.readIndex(spark, idx).collect()
      .map(_.getAs[Long]("canonical_id")).toSet
    assert(finalIds == Set(1L, 3L, 11L))
  }
}
