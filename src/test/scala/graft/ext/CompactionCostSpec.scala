package graft.ext

import java.nio.file.Files

import graft.SparkSpec

/** Prices the streaming twins' auto-compaction policy from DATA — the
  * numbers an operator sizes `maxIndexFiles` from (see
  * DedupIndex.CompactionStats for the model these measurements pin):
  *
  *  - compaction cost ∝ CURRENT index size: `filesRead` equals the live
  *    data-file count at fire time (full rewrite, nothing incremental);
  *  - the rewrite output is bounded by parallelism, independent of how
  *    many append files piled up;
  *  - under the threshold policy, total files rewritten over a run is
  *    ~threshold per firing — so raising `maxIndexFiles` trades fewer,
  *    individually-larger rewrites against probe-side small-file decay.
  */
class CompactionCostSpec extends SparkSpec {

  test("compaction reads the whole live index and rewrites it into a " +
      "bounded file count (the threshold policy's amortized cost model)") {
    import spark.implicits._
    val idx = Files.createTempDirectory("compact-cost-idx").toString

    // simulate the stream's admission loop: B batches of distinct docs,
    // recording the per-batch file growth the threshold polices
    var appended = Vector.empty[Int]
    var prev = 0
    for (b <- 1 to 5) {
      DedupIndex.admit(spark, idx, Seq(
        (b * 10L, s"batch $b doc a"), (b * 10L + 1, s"batch $b doc b"))
        .toDF("doc_id", "text"))
      val now = DedupIndex.dataFileCount(spark, idx)
      appended :+= (now - prev)
      prev = now
    }
    val liveBefore = DedupIndex.dataFileCount(spark, idx)
    assert(appended.forall(_ >= 1), s"each admit appends files: $appended")
    assert(liveBefore == appended.sum) // growth is pure accumulation

    val cs = DedupIndex.compact(spark, idx)
    // cost model, measured: the full live index is read...
    assert(cs.filesRead == liveBefore,
      s"filesRead=${cs.filesRead} != live=$liveBefore")
    // ...and rewritten into at most defaultParallelism files
    assert(cs.filesWritten <= spark.sparkContext.defaultParallelism,
      s"filesWritten=${cs.filesWritten}")
    assert(DedupIndex.dataFileCount(spark, idx) == cs.filesWritten)
    // content invariance is q95/DedupIndexSpec territory; here we only
    // price the rewrite. A second compact on the already-compacted
    // index prices the steady-state base w (the model's denominator):
    val cs2 = DedupIndex.compact(spark, idx)
    assert(cs2.filesRead == cs.filesWritten)
  }

  test("a missing index dir compacts as a free no-op") {
    val cs = DedupIndex.compact(spark, "/tmp/graft-no-such-index-dir")
    assert(cs == DedupIndex.CompactionStats(0, 0))
  }
}
