package graft.ext

import java.nio.file.Files

import graft.SparkSpec

class TextNearDupIndexSpec extends SparkSpec {

  // a 24-token document and a near-dup sharing 23 of its 24 distinct
  // unigrams (one word appended): J = 24/25 = 0.96, so ≥ 15 of 16
  // minhashes agree unless the new word wins a hash slot — the xxhash64
  // values are deterministic, so the outcome is pinned, and the base
  // admission tests only need "near" to be rejected and "far" admitted
  private val baseText = (1 to 24).map(i => s"w$i").mkString(" ")
  private val nearText = baseText + " extra"
  private val farText = (1 to 24).map(i => s"v$i").mkString(" ")

  private def df(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("cross-run rejection: a near-dup re-crawl (1 token added) is " +
      "dropped in a later batch; unrelated text admits") {
    val idx = Files.createTempDirectory("textdup-idx").toString
    val r1 = TextNearDupIndex.admit(spark, idx, df(1L -> baseText))
    assert(r1.select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(1L))
    val r2 = TextNearDupIndex.admit(spark, idx,
      df(10L -> nearText, 11L -> farText))
    assert(r2.select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(11L))
    assert(TextNearDupIndex.readIndex(spark, idx)
      .select("doc_id").distinct().count() == 2)
  }

  test("in-batch near-dups collapse to the min doc_id") {
    val idx = Files.createTempDirectory("textdup-idx2").toString
    val r = TextNearDupIndex.admit(spark, idx,
      df(5L -> baseText, 6L -> nearText, 7L -> farText))
    assert(r.select("doc_id").collect().map(_.getLong(0)).sorted
      .toSeq == Seq(5L, 7L))
  }

  test("fresh index dir bootstraps; replayed batch re-derives identical " +
      "admissions (retry idempotency)") {
    val idx = Files.createTempDirectory("textdup-idx3").toString
    assert(TextNearDupIndex.readIndex(spark, idx).isEmpty)
    val batch = df(1L -> baseText, 2L -> nearText, 3L -> farText)
    val first = TextNearDupIndex.admit(spark, idx, batch)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val replay = TextNearDupIndex.admit(spark, idx, batch)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(first.toSeq == Seq(1L, 3L))
    assert(replay.toSeq == first.toSeq, "replay flipped admission verdicts")
  }

  test("signature agreement gate is the knob: minMatches=0 rejects " +
      "anything sharing a band key, minMatches=17 rejects nothing") {
    val idx = Files.createTempDirectory("textdup-idx4").toString
    TextNearDupIndex.admit(spark, idx, df(1L -> baseText))
    // 17 > 16 possible matches: even the identical text admits
    val all = TextNearDupIndex.admit(spark, idx,
      df(20L -> baseText), minMatches = 17)
    assert(all.count() == 1)
  }

  test("compact: signature rows survive as an exact multiset, file count " +
      "bounded, and the compacted index still rejects a re-crawl") {
    val idx = Files.createTempDirectory("textdup-idx5").toString
    // decay: three admits of unrelated docs (distinct token alphabets)
    TextNearDupIndex.admit(spark, idx, df(1L -> baseText))
    TextNearDupIndex.admit(spark, idx, df(2L -> farText))
    TextNearDupIndex.admit(spark, idx,
      df(3L -> (1 to 24).map(i => s"u$i").mkString(" ")))
    def rows() = TextNearDupIndex.readIndex(spark, idx).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("band"),
        r.getAs[String]("band_key"),
        r.getAs[scala.collection.Seq[Long]]("sig").mkString(",")))
      .sorted.toSeq
    val before = rows()
    val filesBefore = DedupIndex.dataFileCount(spark, idx)
    TextNearDupIndex.compact(spark, idx)
    val after = rows()
    assert(after == before, "compaction changed index CONTENT")
    val filesAfter = DedupIndex.dataFileCount(spark, idx)
    assert(filesAfter <= spark.sparkContext.defaultParallelism,
      s"compaction left $filesAfter files")
    assert(filesAfter <= filesBefore)
    // post-compact: near-dup of an admitted doc still rejected
    val r = TextNearDupIndex.admit(spark, idx, df(30L -> nearText))
    assert(r.isEmpty, "compacted index lost a rejection")
  }

  test("forget: a near-dup of FORGOTTEN text re-admits; survivors' " +
      "near-dups stay rejected") {
    import spark.implicits._
    val idx = Files.createTempDirectory("textdup-idx-forget").toString
    TextNearDupIndex.admit(spark, idx, df(1L -> baseText, 2L -> farText))
    assert(TextNearDupIndex.admit(spark, idx, df(10L -> nearText)).isEmpty)

    TextNearDupIndex.forget(spark, idx, Seq(1L).toDF("doc_id"))
    assert(TextNearDupIndex.readIndex(spark, idx)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
      == Set(2L))

    val r = TextNearDupIndex.admit(spark, idx,
      df(20L -> nearText, 21L -> (farText + " plus")))
    // nearText (forgotten base) admits; farText's near-dup is rejected
    assert(r.select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(20L))
  }
}
