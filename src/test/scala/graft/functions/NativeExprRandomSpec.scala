package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** RANDOMIZED differential coverage for the hot native expressions
  * — the fixture-based specs (PqArgminSpec / MinHashSigSpec /
  * LongVecSpec) pin the known edge shapes; this suite drives seeded-random inputs through
  * wide value ranges so a latent divergence between the fused loops and
  * their declarative oracles (overflow handling, tie-breaks on
  * coincidentally equal distances, tokenizer corner cases the fixtures
  * never produce) cannot hide. Seeds are FIXED — every run tests the
  * same 200-row corpora, so a failure is reproducible, not flaky. */
class NativeExprRandomSpec extends SparkSpec {

  private def withSQLConf(kv: (String, String)*)(f: => Unit): Unit = {
    val old = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  // ---- pq_argmin ------------------------------------------------------

  private val M = 8
  private val SD = 4

  /** Random grid vectors at production-like magnitude (round(x·1000) of
    * a few-σ gaussian → ±~10^4; stretched to ±10^6 for headroom — d2
    * sums stay far below Long overflow: 64·(2·10^6)² ≈ 2.6e14). */
  private def randVecs(seed: Int, n: Int) = {
    import spark.implicits._
    val r = new scala.util.Random(seed)
    (0L until n.toLong).map { id =>
      id -> Seq.fill(M * SD)(r.nextLong() % 1000000L)
    }.toDF("vec_id", "qa")
  }

  /** Random codebook with per-sub cell counts 1..6, non-contiguous ids,
    * and a DELIBERATE duplicate centroid pair per sub when count >= 2
    * (cells i and i+1 share values) so ties are exercised, not lucky. */
  private def randCodebook(seed: Int): Seq[(Int, Int, Seq[Long])] = {
    val r = new scala.util.Random(seed)
    (0 until M).flatMap { m =>
      val k = 1 + r.nextInt(6)
      val cents = Seq.fill(k)(Seq.fill(SD)(r.nextLong() % 1000000L))
      val withDup =
        if (k >= 2) cents.updated(1, cents.head) else cents
      withDup.zipWithIndex.map { case (c, i) =>
        (m, i * (1 + r.nextInt(3)), c) // non-contiguous cell ids
      }
    }.sortBy(t => (t._1, t._2))
  }

  private def declarativeArgmin(df: org.apache.spark.sql.DataFrame,
      codebook: Seq[(Int, Int, Seq[Long])]) = {
    val bySub: Seq[Seq[(Int, Seq[Long])]] = (0 until M).map(m =>
      codebook.collect { case (`m`, cell, cs) => (cell, cs) })
    df.withColumn("__cents", typedLit(bySub))
      .withColumn("ba", expr(
        s"""transform(sequence(0, ${M - 1}), m ->
          |  array_min(transform(element_at(__cents, m + 1), c ->
          |    named_struct(
          |      'd2', aggregate(zip_with(slice(qa, m * $SD + 1, $SD),
          |              c._2, (a, b) -> (a - b) * (a - b)),
          |            cast(0 as bigint), (acc, x) -> acc + x),
          |      'cell', c._1))))""".stripMargin))
      .select(col("vec_id"), col("ba"))
  }

  test("pq_argmin matches the declarative form on random vectors and " +
      "random codebooks with planted ties, under both eval modes") {
    (1 to 3).foreach { trial =>
      val vecs = randVecs(seed = 100 + trial, n = 200)
      val cb = randCodebook(seed = 500 + trial)
      val native = vecs.select(col("vec_id"),
        PqArgmin.argmin(col("qa"), cb, M, SD).as("ba"))
      val a = native.orderBy("vec_id").collect()
      val b = declarativeArgmin(vecs, cb).orderBy("vec_id").collect()
      assert(a.length == 200)
      a.zip(b).foreach { case (x, y) =>
        assert(x == y, s"trial $trial: $x != $y") }
      withSQLConf("spark.sql.codegen.wholeStage" -> "false",
          "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
        val interp = native.orderBy("vec_id").collect()
        a.zip(interp).foreach { case (x, y) =>
          assert(x == y, s"trial $trial interpreted: $x != $y") }
      }
    }
  }

  // ---- minhash_sig ----------------------------------------------------

  /** Random documents over a vocabulary that exercises the tokenizer's
    * hostile shapes: empty tokens (consecutive/leading/trailing spaces),
    * unicode, digits, colons (the 'i:w' hash-input separator), and long
    * words — plus fully empty documents. */
  private def randDocs(seed: Int, n: Int) = {
    import spark.implicits._
    val r = new scala.util.Random(seed)
    val vocab = Vector("a", "bb", "λword", "x:y", "", "0042", "zzz-zzz",
      "SameCase", "samecase", "日本語", "a" * 40, "tail:")
    (0L until n.toLong).map { id =>
      val words = Seq.fill(1 + r.nextInt(30))(vocab(r.nextInt(vocab.size)))
      val doc =
        if (id % 17 == 0) ""
        else words.mkString(" ")
      id -> doc
    }.toDF("doc_id", "text")
  }

  /** The declarative HOF form minhash_sig replaced — md5-slice 60-bit
    * min over distinct SQL-split tokens per hash index. */
  private def declarativeSig(df: org.apache.spark.sql.DataFrame) =
    df.select(col("doc_id"), expr(
      """transform(sequence(0, 15), i ->
        |  array_min(transform(array_distinct(split(text, ' ')), w ->
        |    cast(conv(substring(md5(concat(cast(i as string), ':', w)),
        |      1, 15), 16, 10) as bigint))))""".stripMargin).as("sig"))

  // ---- long_vec_dot / long_vec_l2 ------------------------------------

  /** Random signed long pairs at grid magnitude (±10^6, same headroom
    * argument as randVecs) across varying dimensionalities, including
    * dim-1 and dim-0 (empty arrays: both reductions are 0, not null). */
  private def randPairs(seed: Int, n: Int) = {
    import spark.implicits._
    val r = new scala.util.Random(seed)
    (0L until n.toLong).map { id =>
      val d = if (id % 19 == 0) 0 else 1 + r.nextInt(96)
      (id, Seq.fill(d)(r.nextLong() % 1000000L),
        Seq.fill(d)(r.nextLong() % 1000000L))
    }.toDF("id", "a", "b")
  }

  test("long_vec_dot / long_vec_l2 match the declarative forms on " +
      "random signed vectors across dimensionalities, both eval modes") {
    (1 to 3).foreach { trial =>
      val df = randPairs(seed = 1300 + trial, n = 200)
      val native = df.select(col("id"),
        LongVec.dot(col("a"), col("b")).as("dot"),
        LongVec.l2(col("a"), col("b")).as("l2"))
      val decl = df.select(col("id"),
        expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0L, " +
          "(acc, v) -> acc + v)").as("dot"),
        expr("aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), " +
          "cast(0 as bigint), (acc, v) -> acc + v)").as("l2"))
      val a = native.orderBy("id").collect()
      val b = decl.orderBy("id").collect()
      assert(a.length == 200)
      a.zip(b).foreach { case (x, y) =>
        assert(x == y, s"trial $trial: $x != $y") }
      withSQLConf("spark.sql.codegen.wholeStage" -> "false",
          "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
        val interp = native.orderBy("id").collect()
        a.zip(interp).foreach { case (x, y) =>
          assert(x == y, s"trial $trial interpreted: $x != $y") }
      }
    }
  }

  test("minhash_sig matches the declarative form on random hostile " +
      "documents, under both eval modes") {
    (1 to 3).foreach { trial =>
      val docs = randDocs(seed = 900 + trial, n = 200)
      val native = docs.select(col("doc_id"),
        MinHashSig.sig(col("text")).as("sig"))
      val a = native.orderBy("doc_id").collect()
      val b = declarativeSig(docs).orderBy("doc_id").collect()
      assert(a.length == 200)
      a.zip(b).foreach { case (x, y) =>
        assert(x == y, s"trial $trial: $x != $y") }
      withSQLConf("spark.sql.codegen.wholeStage" -> "false",
          "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
        val interp = native.orderBy("doc_id").collect()
        a.zip(interp).foreach { case (x, y) =>
          assert(x == y, s"trial $trial interpreted: $x != $y") }
      }
    }
  }
}
