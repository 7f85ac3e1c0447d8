package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class CdcRow(key: Long, value: String)
case class SeqCdcRow(key: Long, value: String, seq: Long)

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

  test("a micro-batch carrying several changes to one key collapses " +
      "to the latest by the sequence column before applying — no " +
      "duplicate keys, no rejected batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("merge-seq").toString + "/t"
    val ckpt = Files.createTempDirectory("merge-seq-ckpt").toString
    graft.ext.MergeTable.create(
      (1L to 10L).map(i => SeqCdcRow(i, s"v$i", 0L)).toDF(), dir, "key")
    val input = MemoryStream[SeqCdcRow]
    // key 3 changes twice in ONE batch (out of arrival order on seq),
    // key 11 is inserted then updated in the same batch
    input.addData(SeqCdcRow(3, "mid", 7), SeqCdcRow(3, "final", 9),
      SeqCdcRow(3, "early", 2), SeqCdcRow(11, "ins", 1),
      SeqCdcRow(11, "upd", 2))
    MergeStream.start(input.toDF(), dir, ckpt, seqCol = Some("seq"))
      .awaitTermination()
    val t = graft.ext.MergeTable.readTable(spark, dir)
    assert(t.count() === 11L, "collapse must leave one row per key")
    val got = t.filter(col("key").isin(3L, 11L))
      .select("key", "value").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(3L -> "final", 11L -> "upd"))
    // and WITHOUT the collapse, the same shape fails loudly instead of
    // writing duplicate keys (the upsert contract)
    val input2 = MemoryStream[SeqCdcRow]
    input2.addData(SeqCdcRow(5, "a", 1), SeqCdcRow(5, "b", 2))
    val ckpt2 = Files.createTempDirectory("merge-seq-ckpt2").toString
    val q = MergeStream.start(input2.toDF(), dir, ckpt2)
    val err = intercept[Exception] { q.awaitTermination() }
    assert(err.getMessage.contains("one row per key") ||
      Option(err.getCause).exists(_.getMessage.contains("one row per key")))
  }

  private def clauseSet = (
    Seq(graft.ext.MergeTable.MergeWhen(None,
      graft.ext.MergeTable.MergeAction.Delete)),
    Seq(graft.ext.MergeTable.MergeWhen(None,
      graft.ext.MergeTable.MergeAction.UpdateAll)))

  test("clause drain is EXACTLY-ONCE under replay: the in-manifest " +
      "token gates a re-delivered batch, so a matched delete cannot " +
      "flip back into a not-matched insert") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("merge-cl").toString + "/t"
    val ckpt = Files.createTempDirectory("merge-cl-ckpt").toString
    graft.ext.MergeTable.create(
      (1L to 10L).map(i => CdcRow(i, s"v$i")).toDF(), dir, "key")
    val (m, nm) = clauseSet // matched rows die, new keys insert
    def vals(keys: Long*): Map[Long, String] =
      graft.ext.MergeTable.readTable(spark, dir)
        .filter(col("key").isin(keys: _*)).select("key", "value")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val input = MemoryStream[CdcRow]
    input.addData(CdcRow(3, "x"), CdcRow(30, "ins"))
    // simulate the crash window: the TABLE commit landed (with the
    // stream's token for batch 0) but the CHECKPOINT commit did not —
    // exactly the state a kill between the two leaves behind
    graft.ext.MergeTable.merge(spark, dir,
      Seq(CdcRow(3, "x"), CdcRow(30, "ins")).toDF(),
      matched = m, notMatched = nm,
      idempotencyToken = Some("s1:0"))
    assert(vals(3L, 30L) === Map(30L -> "ins"), "3 deleted, 30 inserted")
    assert(graft.ext.MergeTable.lastAppliedBatch(spark, dir, "s1")
      === Some(0L))
    // restart: foreachBatch re-delivers batch 0; without the gate the
    // replay would RE-INSERT 3 (now not-matched) and DELETE 30 (now
    // matched) — the flip-flop that makes clause merges non-idempotent
    MergeStream.startClauses(input.toDF(), dir, ckpt,
      matched = m, notMatched = nm, streamId = Some("s1"))
      .awaitTermination()
    assert(vals(3L, 30L) === Map(30L -> "ins"),
      "the replayed batch must be skipped, not re-applied")
    // a genuinely NEW batch still applies (and advances the token)
    input.addData(CdcRow(30, "y"), CdcRow(40, "ins2"))
    MergeStream.startClauses(input.toDF(), dir, ckpt,
      matched = m, notMatched = nm, streamId = Some("s1"))
      .awaitTermination()
    assert(vals(3L, 30L, 40L) === Map(40L -> "ins2"),
      "30 matched its second change and died; 40 inserted")
    assert(graft.ext.MergeTable.lastAppliedBatch(spark, dir, "s1")
      === Some(1L))
    // foreign tokens never gate this stream
    assert(graft.ext.MergeTable.lastAppliedBatch(spark, dir, "other")
      === None)
  }

  test("clause drain composes with the seq collapse: several changes " +
      "to one key in one micro-batch apply as the key's final word " +
      "through the clause algebra") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("merge-clseq").toString + "/t"
    val ckpt = Files.createTempDirectory("merge-clseq-ckpt").toString
    graft.ext.MergeTable.create(
      (1L to 10L).map(i => SeqCdcRow(i, s"v$i", 0L)).toDF(), dir, "key")
    val input = MemoryStream[SeqCdcRow]
    // key 4: two changes in one batch — only the seq-latest ("keep")
    // reaches the clauses, so the conditional update fires on it
    input.addData(SeqCdcRow(4, "drop", 1), SeqCdcRow(4, "keep", 2),
      SeqCdcRow(50, "new", 1))
    MergeStream.startClauses(input.toDF(), dir, ckpt,
      matched = Seq(graft.ext.MergeTable.MergeWhen(
        Some(col("src.value") === "keep"),
        graft.ext.MergeTable.MergeAction.Update(
          Map("value" -> col("src.value"))))),
      notMatched = Seq(graft.ext.MergeTable.MergeWhen(None,
        graft.ext.MergeTable.MergeAction.UpdateAll)),
      seqCol = Some("seq")).awaitTermination()
    val got = graft.ext.MergeTable.readTable(spark, dir)
      .filter(col("key").isin(4L, 50L)).select("key", "value")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(4L -> "keep", 50L -> "new"))
    assert(graft.ext.MergeTable.readTable(spark, dir).count() === 11L)
  }

  test("TWO concurrent clause streams into one table: per-stream " +
      "tokens gate independently, the conflict-retry protocol " +
      "serializes the commits, and the final state is the clause " +
      "algebra over both sources") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("merge-2s").toString + "/t"
    graft.ext.MergeTable.create(
      (1L to 40L).map(i => CdcRow(i, s"v$i")).toDF(), dir, "key")
    val m = Seq(graft.ext.MergeTable.MergeWhen(None,
      graft.ext.MergeTable.MergeAction.Update(
        Map("value" -> col("src.value")))))
    val nm = Seq(graft.ext.MergeTable.MergeWhen(None,
      graft.ext.MergeTable.MergeAction.UpdateAll))
    val inA = MemoryStream[CdcRow]; val inB = MemoryStream[CdcRow]
    // disjoint key ranges, so any serialization of the two streams'
    // commits lands the same final state — what the protocol promises
    inA.addData(CdcRow(1, "a1"), CdcRow(41, "a-ins"))
    inB.addData(CdcRow(2, "b1"), CdcRow(42, "b-ins"))
    val ckA = Files.createTempDirectory("merge-2s-a").toString
    val ckB = Files.createTempDirectory("merge-2s-b").toString
    val qa = MergeStream.startClauses(inA.toDF(), dir, ckA,
      matched = m, notMatched = nm, streamId = Some("sA"))
    val qb = MergeStream.startClauses(inB.toDF(), dir, ckB,
      matched = m, notMatched = nm, streamId = Some("sB"))
    qa.awaitTermination(); qb.awaitTermination()
    val t = graft.ext.MergeTable.readTable(spark, dir)
    assert(t.count() === 42L)
    val got = t.filter(col("key").isin(1L, 2L, 41L, 42L))
      .select("key", "value").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "a1", 2L -> "b1", 41L -> "a-ins",
      42L -> "b-ins"))
    assert(graft.ext.MergeTable.lastAppliedBatch(spark, dir, "sA")
      === Some(0L))
    assert(graft.ext.MergeTable.lastAppliedBatch(spark, dir, "sB")
      === Some(0L),
      "each stream's frontier must survive the other's commits " +
        "(token carry-forward)")
    // second round: both streams advance; tokens advance independently
    inA.addData(CdcRow(41, "a2"))
    inB.addData(CdcRow(42, "b2"))
    MergeStream.startClauses(inA.toDF(), dir, ckA,
      matched = m, notMatched = nm, streamId = Some("sA"))
      .awaitTermination()
    MergeStream.startClauses(inB.toDF(), dir, ckB,
      matched = m, notMatched = nm, streamId = Some("sB"))
      .awaitTermination()
    assert(graft.ext.MergeTable.lastAppliedBatch(spark, dir, "sA")
      === Some(1L))
    assert(graft.ext.MergeTable.lastAppliedBatch(spark, dir, "sB")
      === Some(1L))
  }

  test("a clause merge that LOSES the commit race re-dispatches its " +
      "clauses against the winner's snapshot — conditions re-evaluate " +
      "on the new state, and the idempotency token lands with the " +
      "retried commit") {
    import spark.implicits._
    val dir = Files.createTempDirectory("merge-race").toString + "/t"
    graft.ext.MergeTable.create(
      (1L to 10L).map(i => CdcRow(i, "orig")).toDF(), dir, "key")
    // the clause deletes matched rows still reading 'orig'; a
    // concurrent upsert moves key 1 to 'moved' BETWEEN the loser's
    // epoch write and its promotion — after the retry, key 1 must
    // SURVIVE (the condition is false against the winner's snapshot);
    // a blind re-promote of the stale epoch would have deleted it
    var planted = false
    val st = graft.ext.MergeTable.mergeWithHook(spark, dir,
      Seq(CdcRow(1, "x"), CdcRow(2, "x")).toDF(),
      matched = Seq(graft.ext.MergeTable.MergeWhen(
        Some(col("tgt.value") === "orig"),
        graft.ext.MergeTable.MergeAction.Delete)),
      notMatched = Nil, notMatchedBySource = Nil,
      idempotencyToken = Some("sX:5"),
      beforeCommit = () => if (!planted) {
        planted = true
        graft.ext.MergeTable.upsert(spark, dir,
          Seq(CdcRow(1, "moved")).toDF()): Unit
      })
    assert(st.rowsDeleted === 1L,
      s"only key 2 still read 'orig' after the winner's commit: $st")
    val t = graft.ext.MergeTable.readTable(spark, dir)
    assert(t.filter(col("key") === 1L).select("value")
      .collect().head.getString(0) === "moved",
      "the loser must re-evaluate against the winner's snapshot")
    assert(t.filter(col("key") === 2L).count() === 0L)
    assert(graft.ext.MergeTable.lastAppliedBatch(spark, dir, "sX")
      === Some(5L), "the token must ride the RETRIED commit")
  }
}
