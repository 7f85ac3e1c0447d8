package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SubstringDfIndexSpec extends SparkSpec {
  import SubstringDfIndex._

  private def words(prefix: String, n: Int): Seq[String] =
    (0 until n).map(i => s"$prefix$i")
  private val run = words("dup", 10)

  private def freshDir(): String = java.nio.file.Files
    .createTempDirectory("graft-ssdf").resolve("index").toString

  private def doc(id: Long, pre: Int, mid: Seq[String], post: Int) = {
    val p = s"p$id"
    id -> ((words(p + "a", pre) ++ mid ++ words(p + "b", post)).mkString(" "))
  }

  private def admitDocs(idx: String, runId: Long,
      docs: Seq[(Long, String)]): Map[Long, org.apache.spark.sql.Row] = {
    import spark.implicits._
    admit(spark, idx, docs.toDF("doc_id", "text"), runId)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
  }

  test("forward-only cross-run excision: the first carrier keeps the " +
      "run, a later batch's repeat is cut against the persisted corpus") {
    val idx = freshDir()
    val a = admitDocs(idx, 0L, Seq(doc(1L, 2, run, 6)))
    assert(a(1L).getAs[Long]("dup_tokens") == 0, "first carrier must keep")
    val b = admitDocs(idx, 1L, Seq(doc(2L, 5, run, 3)))
    assert(b(2L).getAs[Long]("dup_tokens") == 10 &&
      b(2L).getAs[Long]("n_spans") == 1,
      "second carrier must excise the run seen in run 0")
  }

  test("batch-internal repeats excise within one admit; unique docs " +
      "pass untouched") {
    val idx = freshDir()
    val out = admitDocs(idx, 0L,
      Seq(doc(1L, 1, run, 2), doc(2L, 4, run, 1), doc(3L, 0, words("u", 15), 0)))
    assert(out(1L).getAs[Long]("dup_tokens") == 10)
    assert(out(2L).getAs[Long]("dup_tokens") == 10)
    assert(out(3L).getAs[Long]("dup_tokens") == 0)
  }

  test("replay idempotency: re-admitting the same run id returns the " +
      "same rows and cannot double-count df (a replayed doc is not its " +
      "own duplicate)") {
    val idx = freshDir()
    val docs = Seq(doc(1L, 2, run, 6), doc(3L, 0, words("u", 15), 0))
    val first = admitDocs(idx, 0L, docs)
    val replay = admitDocs(idx, 0L, docs)
    assert(first.keySet == replay.keySet)
    for (id <- first.keySet)
      assert(first(id).toSeq == replay(id).toSeq,
        s"replayed row differs for doc $id")
    // the run-partition overwrite keeps the pair table exact
    assert(readIndex(spark, idx).select("doc_id", "fp").distinct().count() ==
      readIndex(spark, idx).count())
  }

  test("compaction: runs collapse into the reserved epoch, df-contract " +
      "content is invariant, k meta survives, admissions continue") {
    val idx = freshDir()
    admitDocs(idx, 0L, Seq(doc(1L, 2, run, 6)))
    admitDocs(idx, 1L, Seq(doc(2L, 0, words("v", 12), 0)))
    val pairsBefore = readIndex(spark, idx).select("doc_id", "fp")
      .collect().map(_.toSeq).toSet
    val stats = compact(spark, idx)
    assert(stats.filesRead > 0 && stats.filesWritten > 0)
    assert(readIndex(spark, idx).select("doc_id", "fp")
      .collect().map(_.toSeq).toSet == pairsBefore,
      "compaction changed the pair multiset")
    assert(readIndex(spark, idx).select("run").distinct()
      .collect().map(_.getLong(0)).toSeq == Seq(-1L))
    // the index keeps excising after the swap — and the k contract is
    // still enforced from the carried meta
    val c = admitDocs(idx, 2L, Seq(doc(4L, 3, run, 2)))
    assert(c(4L).getAs[Long]("dup_tokens") == 10)
    intercept[IllegalArgumentException] {
      import spark.implicits._
      admit(spark, idx, Seq(doc(9L, 1, run, 1)).toDF("doc_id", "text"),
        runId = 3L, k = 5)
    }
  }

  test("forget drops a document's SEEN contribution — but a phrase is " +
      "free again only when EVERY seer is forgotten (the index stores " +
      "raw-text pairs, including spans its own admit excised)") {
    val idx = freshDir()
    admitDocs(idx, 0L, Seq(doc(1L, 2, run, 6)))
    val b = admitDocs(idx, 1L, Seq(doc(2L, 5, run, 3)))
    assert(b(2L).getAs[Long]("dup_tokens") == 10) // doc 2 excised the run...
    import spark.implicits._
    // ...yet doc 2 still counts as a SEER: forgetting doc 1 alone does
    // not free the phrase for a third carrier
    forget(spark, idx, Seq(1L).toDF("doc_id"))
    val c = admitDocs(idx, 2L, Seq(doc(3L, 1, run, 4)))
    assert(c(3L).getAs[Long]("dup_tokens") == 10,
      "doc 2's seen-contribution must still reject the phrase")
    // forgetting the remaining seers (2 and the just-admitted 3) frees it
    forget(spark, idx, Seq(2L, 3L).toDF("doc_id"))
    val d = admitDocs(idx, 3L, Seq(doc(4L, 2, run, 2)))
    assert(d(4L).getAs[Long]("dup_tokens") == 0,
      "with every seer forgotten the phrase must re-admit clean")
  }
}
