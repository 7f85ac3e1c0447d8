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
}
