package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MinHashSigSpec extends SparkSpec {

  /** The declarative HOF form minhash_sig replaced — the differential
    * oracle: 16 × (split + array_distinct + per-token md5-hex-conv),
    * identical hash algebra. */
  private def declarative(df: org.apache.spark.sql.DataFrame) =
    df.select(col("doc_id"), expr(
      """transform(sequence(0, 15), i ->
        |  array_min(transform(array_distinct(split(text, ' ')),
        |    w -> cast(conv(substring(
        |           md5(concat(cast(i as string), ':', w)), 1, 15),
        |         16, 10) as bigint))))""".stripMargin).as("sig"))

  private def native(df: org.apache.spark.sql.DataFrame) =
    df.select(col("doc_id"), MinHashSig.sig(col("text")).as("sig"))

  // tokenization edge cases the split(" ", -1) contract must pin:
  // consecutive/leading/trailing spaces (empty tokens KEPT), the empty
  // string (one empty token), single token, unicode, repeats (dedup),
  // and >16 distinct tokens
  private def edgeDocs = {
    import spark.implicits._
    Seq(
      1L -> "alpha beta gamma",
      2L -> "alpha  beta",
      3L -> " leading",
      4L -> "trailing ",
      5L -> "",
      6L -> " ",
      7L -> "solo",
      8L -> "héllo wörld 你好",
      9L -> "rep rep rep rep",
      10L -> (1 to 24).map(i => s"tok$i").mkString(" "),
      11L -> "a:b i:w 0:x",
      12L -> "\ttab\nnewline stays one-token"
    ).toDF("doc_id", "text")
  }

  test("minhash_sig is bit-identical to the declarative HOF form on " +
      "edge-case tokenizations AND the fixture corpus") {
    val edge = edgeDocs
    val a = native(edge).orderBy("doc_id").collect()
    val b = declarative(edge).orderBy("doc_id").collect()
    assert(a.length == b.length && a.nonEmpty)
    a.zip(b).foreach { case (x, y) => assert(x == y, s"$x != $y") }
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val fa = native(docs).orderBy("doc_id").collect()
    val fb = declarative(docs).orderBy("doc_id").collect()
    assert(fa.length == fb.length && fa.nonEmpty)
    fa.zip(fb).foreach { case (x, y) => assert(x == y, s"$x != $y") }
  }

  test("minhash_sig survives both codegen and interpreted evaluation") {
    val whole = native(edgeDocs).collect().map(_.toString).sorted
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
        "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      val interp = native(edgeDocs).collect().map(_.toString).sorted
      assert(whole.toSeq == interp.toSeq)
    }
  }

  test("minhash_sig structural contract: 16 non-negative sub-2^60 " +
      "values; null text is null; identical token SETS share signatures") {
    import spark.implicits._
    val rows = native(edgeDocs).collect()
    rows.foreach { r =>
      val sig = r.getAs[scala.collection.Seq[Long]]("sig")
      assert(sig.length == 16)
      sig.foreach(v => assert(v >= 0L && v < (1L << 60)))
    }
    val n = Seq((1L, Option.empty[String]), (2L, Some("a b")))
      .toDF("doc_id", "text")
    val got = native(n).orderBy("doc_id").collect()
    assert(got(0).isNullAt(1))
    assert(!got(1).isNullAt(1))
    // order/multiplicity of tokens is irrelevant: same distinct set,
    // same signature (the re-render property TextNearDupIndex relies on)
    val pair = Seq(10L -> "x y z", 11L -> "z z y x x").toDF("doc_id", "text")
    val sigs = native(pair).collect()
      .map(_.getAs[scala.collection.Seq[Long]]("sig").toSeq)
    assert(sigs(0) == sigs(1))
  }

  private def withSQLConf(kv: (String, String)*)(f: => Unit): Unit = {
    val old = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
