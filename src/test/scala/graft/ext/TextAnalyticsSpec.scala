package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TextAnalyticsSpec extends SparkSpec {

  test("lang-ID predicts all three marker languages on real sentences") {
    import spark.implicits._
    val docs = Seq(
      (1L, "en", "the cat sat on the mat and it was happy with this"),
      (2L, "de", "der hund lief zu dem haus und das war nicht aus holz"),
      (3L, "fr", "le chat est sur la table avec une pomme dans le jardin"),
      (4L, "zh", "zhong wen yu liao ku")).toDF("doc_id", "lang", "text")
    val out = TextAnalytics.langScores(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("predicted"))
      .toMap
    assert(out == Map(1L -> "en", 2L -> "de", 3L -> "fr", 4L -> "und"))
  }

  test("lang-ID tie-break is deterministic: equal scores resolve en > de > fr") {
    import spark.implicits._
    // "in" is an en marker, "von" a de marker, "le" an fr marker: craft
    // exact score ties and check the documented priority
    val docs = Seq(
      (1L, "xx", "in von"), // en=1 de=1 fr=0 -> en
      (2L, "xx", "von le"), // en=0 de=1 fr=1 -> de
      (3L, "xx", "le le")   // fr only -> fr
    ).toDF("doc_id", "lang", "text")
    val out = TextAnalytics.langScores(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("predicted"))
      .toMap
    assert(out == Map(1L -> "en", 2L -> "de", 3L -> "fr"))
  }

  test("q36 fixture run: every row scored, predictions multi-valued") {
    val out = graft.SparkEntry
      .queries("q36_lang_id")(spark, "/root/testdata/sf0.001")
    val rows = out.collect()
    assert(rows.nonEmpty)
    val dist = rows.groupBy(_.getAs[String]("predicted"))
      .view.mapValues(_.length).toMap
    // the fixture vocabulary is English-only, so en must dominate; the
    // operator still emits the full three-score surface per row
    assert(dist.keySet.contains("en"))
    assert(rows.forall(r => r.getAs[Long]("en_score") >= 0L &&
      r.getAs[Long]("de_score") >= 0L && r.getAs[Long]("fr_score") >= 0L))
  }

  test("vocab pattern tokenizes greedily, longest entry first") {
    import spark.implicits._
    val toks = Seq("customer windows keyhash").toDF("text")
      .select(regexp_extract_all(col("text"),
        lit(TextAnalytics.vocabPattern), lit(0)).as("t"))
      .collect()(0).getSeq[String](0)
    // "customer"/"window"/"hash" are full-word merges; "s"/"y" fall back
    // to single chars; "ke" is a 2-char merge
    assert(toks == Seq("customer", "window", "s", "ke", "y", "hash"))
  }

  test("q91: bloom decontamination has NO false negatives vs q69's exact " +
      "join, and its per-doc exact counts agree with q69") {
    val dir = "/root/testdata/sf0.001"
    val bloom = graft.SparkEntry.queries("q91_bloom_decontamination")(spark, dir)
      .collect()
    val exact = graft.SparkEntry.queries("q69_decontamination")(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_shared_shingles"))
      .toMap
    val bloomByDoc = bloom.map(r => r.getAs[Long]("doc_id") -> r).toMap
    // every exactly-contaminated doc is bloom-flagged (no false
    // negatives — the property that makes a bloom usable for shielding)
    exact.foreach { case (doc, nShared) =>
      val b = bloomByDoc.get(doc)
      assert(b.isDefined, s"doc $doc exact-contaminated but not flagged")
      // and the bloom row's exact count is the same number q69 computed
      assert(b.get.getAs[Long]("n_exact_shingles") == nShared)
    }
    // accounting identity + nonnegative FPR on every flagged doc
    bloom.foreach { r =>
      assert(r.getAs[Long]("n_bloom_shingles") ==
        r.getAs[Long]("n_exact_shingles") + r.getAs[Long]("n_false_pos"))
      assert(r.getAs[Long]("n_false_pos") >= 0L)
      assert(r.getAs[Long]("n_bloom_shingles") >= 1L)
    }
    // the instrument's own FPR reading must sit in the designed regime:
    // at m/n = 32, k = 4 the per-shingle FPR is ~2e-4, so false-positive
    // SHINGLES across the whole train corpus must stay under 1% of the
    // train shingle volume (50x design margin — a failure here means the
    // sizing rule regressed, the saturation failure mode of a fixed m)
    val trainShingles = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") % 50 =!= 7)
      .select(explode(expr(
        """array_distinct(transform(sequence(1,
          |  greatest(size(split(text, ' ')) - 7, 0)),
          |  i -> array_join(slice(split(text, ' '), i, 8), ' ')))"""
          .stripMargin)).as("sh"))
      .count()
    val fpShingles = bloom.map(_.getAs[Long]("n_false_pos")).sum
    assert(fpShingles * 100 <= trainShingles,
      s"$fpShingles FP shingles of $trainShingles train shingles " +
        "(>1%): bloom sizing regressed")
  }

  test("bloom width derivation: power-of-two m/n >= 32 sizing with a " +
      "4096-bit floor, and a hard throw past the literal-array ceiling") {
    // floor and power-of-two growth
    assert(TextAnalytics.bloomWidth(0L) == 4096L)
    assert(TextAnalytics.bloomWidth(128L) == 4096L)   // 32*128 = 4096
    assert(TextAnalytics.bloomWidth(129L) == 8192L)   // next power of two
    (1L to 20L).foreach { n =>
      val m = TextAnalytics.bloomWidth(n * 1000)
      assert((m & (m - 1)) == 0L, s"width $m not a power of two")
      assert(m >= 32L * n * 1000, s"width $m under the m/n=32 rule")
    }
    // the largest admissible corpus sits just under the cap...
    assert(TextAnalytics.bloomWidth(TextAnalytics.BloomMaxBits / 32) ==
      TextAnalytics.BloomMaxBits)
    // ...and one shingle more must throw, not ship a multi-GB literal
    intercept[IllegalArgumentException] {
      TextAnalytics.bloomWidth(TextAnalytics.BloomMaxBits / 32 + 1)
    }
    intercept[IllegalArgumentException] {
      TextAnalytics.bloomWidth(100_000_000L) // ~1e8 eval shingles
    }
  }

  test("q106: repetition signals match a direct in-memory recount") {
    val dir = "/root/testdata/sf0.001"
    val out = graft.SparkEntry.queries("q106_repetition_signals")(spark, dir)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("top_bigram_n") >= 1L)
      assert(r.getAs[Long]("top_bigram_n") <= r.getAs[Long]("n_bigrams"))
      assert(r.getAs[Long]("dup_trigram_n") <= r.getAs[Long]("n_trigrams"))
      // duplicated trigram occurrences come in groups of >= 2
      assert(r.getAs[Long]("dup_trigram_n") != 1L)
    }
    // exact recount for the first 20 docs, straight off the text
    val texts = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") < 20).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val byId = out.map(r => r.getAs[Long]("doc_id") -> r).toMap
    texts.foreach { case (id, text) =>
      val w = text.split(" ")
      if (w.length >= 3) {
        val bi = w.sliding(2).map(_.mkString(" ")).toSeq
        val tri = w.sliding(3).map(_.mkString(" ")).toSeq
        val r = byId(id)
        assert(r.getAs[Long]("n_bigrams") == bi.length)
        assert(r.getAs[Long]("top_bigram_n") ==
          bi.groupBy(identity).values.map(_.length).max)
        assert(r.getAs[Long]("n_trigrams") == tri.length)
        assert(r.getAs[Long]("dup_trigram_n") ==
          tri.groupBy(identity).values.map(_.length)
            .filter(_ >= 2).sum)
      } else assert(!byId.contains(id))
    }
  }

  test("q107: flags exactly q69's docs — the 10-token window overlap " +
      "covers every 8-gram, so chunk granularity loses no detection") {
    val dir = "/root/testdata/sf0.001"
    val q107 = graft.SparkEntry.queries("q107_chunk_decontamination")(
      spark, dir).collect()
    val q69Docs = graft.SparkEntry.queries("q69_decontamination")(spark, dir)
      .select("doc_id").collect().map(_.getAs[Long]("doc_id")).toSet
    assert(q107.map(_.getAs[Long]("doc_id")).toSet == q69Docs)
    q107.foreach { r =>
      assert(r.getAs[Long]("n_bad_chunks") >= 1L)
      assert(r.getAs[Long]("n_bad_chunks") <= r.getAs[Long]("n_chunks"))
    }
  }

  test("q107: clean chunks of a contaminated doc survive with their " +
      "token mass (the surgical case the fixture's short docs never hit)") {
    import spark.implicits._
    val evalText = (1 to 10).map(i => s"ev$i").mkString(" ")
    // train doc: 100 clean tokens, then the contaminated 10, then 20 more
    val trainToks = (1 to 100).map(i => s"c$i") ++
      (1 to 10).map(i => s"ev$i") ++ (1 to 20).map(i => s"t$i")
    val docs = Seq(
      (7L, evalText),                    // doc_id % 50 = 7 -> eval corpus
      (1L, trainToks.mkString(" ")),     // contaminated train doc
      (2L, (1 to 60).map(i => s"z$i").mkString(" ")) // clean train doc
    ).toDF("doc_id", "text")
    val out = TextAnalytics.chunkDecon(docs).collect()
    // only the contaminated doc is reported
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L))
    val r = out.head
    // 130 tokens -> chunks at 0/40/80/120: 4 chunks; the eval 10-gram
    // spans tokens 101-110, inside chunks starting at 80 (81-130) and
    // NOT 40 (41-90) or 120 (121-130) -> exactly one bad chunk
    assert(r.getAs[Long]("n_chunks") == 4L)
    assert(r.getAs[Long]("n_bad_chunks") == 1L)
    // surviving mass: chunks 1-50, 41-90, 121-130 = 50 + 50 + 10
    assert(r.getAs[Long]("clean_tokens") == 110L)
  }
}
