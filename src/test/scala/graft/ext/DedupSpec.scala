package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DedupSpec extends SparkSpec {

  test("hot-shingle guard drops df>maxDf shingles and bounds posting lists") {
    import spark.implicits._
    // "the cat" appears in 6 docs (hot), "rare pair" in 2 (signal)
    val toks = (
      (1L to 6L).map(i => (i, "en", "the cat")) ++
        Seq((1L, "en", "rare pair"), (2L, "en", "rare pair")) ++
        Seq((3L, "fr", "chat rare"))
      ).toDF("doc_id", "lang", "sh")

    val kept = Dedup.withoutHotShingles(toks, Seq("lang", "sh"), maxDf = 3L)
    assert(kept.filter(col("sh") === "the cat").count() == 0)
    assert(kept.filter(col("sh") === "rare pair").count() == 2)
    assert(kept.filter(col("sh") === "chat rare").count() == 1)

    // the bound the self-join relies on: every surviving posting list has
    // df <= maxDf, so join fan-out per shingle is at most maxDf^2
    val worstDf = kept.groupBy("lang", "sh").count()
      .agg(max("count")).collect()(0).getLong(0)
    assert(worstDf <= 3L)
  }

  test("guard is df-based, not frequency-based: dup shingles in ONE doc survive") {
    import spark.implicits._
    // same shingle 5x in one document (df counts rows post array_distinct
    // upstream, but the guard itself must key on the shingle columns only)
    val toks = Seq((1L, "en", "x y"), (2L, "en", "x y"))
      .toDF("doc_id", "lang", "sh")
    val kept = Dedup.withoutHotShingles(toks, Seq("lang", "sh"), maxDf = 2L)
    assert(kept.count() == 2)
  }

  test("connectedComponents THROWS on a >40-hop chain instead of emitting " +
      "silently-unconverged labels") {
    import spark.implicits._
    // path graph 0-1-2-...-99: min label 0 travels one hop per step, so
    // diameter 99 >> the default cap of 10 rounds x 4 hops
    val chain = (0L until 99L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val ex = intercept[IllegalStateException] {
      Dedup.connectedComponents(chain) // default maxIters = 10
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("connectedComponents converges on the same chain under a raised cap") {
    import spark.implicits._
    val chain = (0L until 99L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val comp = Dedup.connectedComponents(chain, maxIters = 40).collect()
    assert(comp.length == 100)
    assert(comp.forall(_.getAs[Long]("component_id") == 0L))
  }

  test("q67: components are a fixpoint — every near-dup pair shares one label") {
    val dir = "/root/testdata/sf0.001"
    val comp = graft.SparkEntry.queries("q67_dedup_components")(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("component_id")).toMap
    val pairs = graft.SparkEntry.queries("q31_ngram_jaccard")(spark, dir)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    assert(pairs.nonEmpty)
    // fixpoint: both endpoints of every verified pair carry the same
    // component label (min-neighbor alone would violate this on chains)
    pairs.foreach { case (a, b) => assert(comp(a) == comp(b)) }
    // canonical representative: the label IS the component's min doc_id
    comp.groupBy(_._2).foreach { case (lbl, members) =>
      assert(lbl == members.keys.min)
    }
  }

  test("q78: multi-probe pair recall is >= 3x single-bucket recall (the " +
      "measured lift that justifies the q79 construction)") {
    val dir = "/root/testdata/sf0.001"
    val r = graft.SparkEntry.queries("q78_neardup_pair_recall")(spark, dir)
      .collect()(0)
    val single = r.getAs[Double]("pair_recall")
    val multi = r.getAs[Double]("multiprobe_recall")
    assert(r.getAs[Long]("n_exact_pairs") > 0)
    assert(multi >= 3.0 * single,
      s"multi-probe recall $multi < 3x single-bucket $single")
    // sanity: multi-probe admits a strict superset of single-bucket pairs
    assert(r.getAs[Long]("n_multiprobe_pairs") >
      r.getAs[Long]("n_lsh_pairs"))
    // the recall/cost curve is monotone in probe radius: widening the
    // Hamming ball can only admit more true pairs (ball containment)
    val multi2 = r.getAs[Double]("multiprobe2_recall")
    assert(multi2 >= multi && multi >= single,
      s"recall not monotone in radius: $single / $multi / $multi2")
    assert(r.getAs[Long]("n_multiprobe2_pairs") >=
      r.getAs[Long]("n_multiprobe_pairs"))
  }

  test("q79 pairs = q55 pairs plus exactly the Hamming-1 boundary " +
      "crossers; every pair matched once (no post-join dedup needed)") {
    val dir = "/root/testdata/sf0.001"
    val q55 = graft.SparkEntry.queries("q55_embedding_neardup_lsh")(spark, dir)
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")))
    val q79 = graft.SparkEntry.queries("q79_neardup_multiprobe")(spark, dir)
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")))
    // superset, and strictly larger (the whole point of probing)
    assert(q55.toSet.subsetOf(q79.toSet))
    assert(q79.length > q55.length)
    // exactly-once matching: the probe-explosion join emits no dup pairs
    assert(q79.distinct.length == q79.length)
  }

  test("q79 probe explosion is ID-ONLY: no array column rides the " +
      "(planes+1)x Generate fan-out (embeddings re-join by id after " +
      "the bucket match)") {
    val dir = "/root/testdata/sf0.001"
    val df = graft.SparkEntry.queries("q79_neardup_multiprobe")(spark, dir)
    val gens = df.queryExecution.optimizedPlan.collect {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
    }
    assert(gens.nonEmpty, "expected the probe-ball explode in the plan")
    gens.foreach { g =>
      val arrays = g.output.filter(
        _.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType])
      assert(arrays.isEmpty,
        s"probe-side Generate replicates payload columns: " +
          arrays.map(a => s"${a.name}:${a.dataType.simpleString}")
            .mkString(", "))
    }
  }

  test("q80: semantic-dedup verdicts are a closure fixpoint over q79 " +
      "pairs with min-member canonicals and exact component sizes") {
    val dir = "/root/testdata/sf0.001"
    val verdicts = graft.SparkEntry.queries("q80_semantic_dedup")(spark, dir)
      .collect()
    val comp = verdicts.map(r => r.getAs[Long]("vec_id") ->
      r.getAs[Long]("component_id")).toMap
    val pairs = graft.SparkEntry.queries("q79_neardup_multiprobe")(spark, dir)
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")))
    assert(pairs.nonEmpty)
    // fixpoint: both endpoints of every near-dup pair share one label
    pairs.foreach { case (a, b) => assert(comp(a) == comp(b)) }
    // canonical = component min; is_kept marks exactly that member
    comp.groupBy(_._2).foreach { case (lbl, members) =>
      assert(lbl == members.keys.min)
    }
    verdicts.foreach { r =>
      assert(r.getAs[Boolean]("is_kept") ==
        (r.getAs[Long]("vec_id") == r.getAs[Long]("component_id")))
    }
    // component_size is the exact member count (singletons included)
    val sizes = comp.groupBy(_._2).map { case (l, m) => l -> m.size }
    verdicts.foreach { r =>
      assert(r.getAs[Long]("component_size") ==
        sizes(r.getAs[Long]("component_id")))
    }
    // every vector got a verdict
    assert(verdicts.length ==
      spark.read.parquet(s"$dir/embeddings.parquet").count())
  }

  test("connectedComponents matches an in-memory union-find on seeded " +
      "random graphs (beyond the fixture's near-clique shape)") {
    import spark.implicits._
    for (seed <- Seq(11, 22, 33)) {
      val rnd = new scala.util.Random(seed)
      val n = 30 + rnd.nextInt(20)
      val edges = (1 to n * 2).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .distinct
      // ground truth: plain union-find over the same edges
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = {
        var r = x; while (parent(r) != r) r = parent(r); r
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(v => v -> {
          // union-find root, then normalize to the component MIN member
          val members = edges.flatMap(e => Seq(e._1, e._2)).distinct
            .filter(u => find(u.toInt) == find(v.toInt))
          members.min
        }).toMap
      val got = Dedup.connectedComponents(
          edges.toDF("doc_a", "doc_b"), maxIters = 20)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          r.getAs[Long]("component_id")).toMap
      assert(got == want, s"seed $seed: labels diverge from union-find")
    }
  }

  test("q79 pair set EQUALS brute-force {hamming<=1, cosine>=0.4} " +
      "computed independently from collected vectors") {
    val dir = "/root/testdata/sf0.001"
    val planes = Dedup.lshPlanes(
      spark.read.parquet(s"$dir/embeddings.parquet").count())
    import org.apache.spark.sql.functions._
    val rows = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"),
        graft.functions.HyperplaneBucket.bucket(col("embedding"), planes)
          .as("b"))
      .collect()
      .map(r => (r.getAs[Long]("vec_id"),
        r.getAs[scala.collection.Seq[Float]]("embedding").toArray,
        r.getAs[Int]("b")))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val want = (for {
      (ia, va, ba) <- rows; (ib, vb, bb) <- rows
      if ia < ib && Integer.bitCount(ba ^ bb) <= 1 && cos(va, vb) >= 0.4
    } yield (ia, ib)).toSet
    val got = graft.SparkEntry.queries("q79_neardup_multiprobe")(spark, dir)
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")))
      .toSet
    assert(got == want,
      s"probe-join pairs (${got.size}) != brute-force (${want.size})")
  }

  test("q105: docs with nothing removed keep their exact text fingerprint, " +
      "and removal is bounded by q72's duplication count") {
    val dir = "/root/testdata/sf0.001"
    val out = graft.SparkEntry.queries("q105_boilerplate_removal")(spark, dir)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), md5(col("text")).as("orig_fp"))
    val q72 = graft.SparkEntry.queries("q72_paragraph_dedup")(spark, dir)
      .select(col("doc_id"), col("n_paragraphs"), col("n_dup_paragraphs"))
    val j = out.join(docs, Seq("doc_id")).join(q72, Seq("doc_id")).collect()
    assert(j.length == 500)
    j.foreach { r =>
      val nSeg = r.getAs[Long]("n_segments")
      val nRem = r.getAs[Long]("n_removed")
      assert(nRem <= nSeg)
      // identical segmentation: q105 and q72 count the same segments
      assert(nSeg == r.getAs[Long]("n_paragraphs"))
      // a segment in >=3 distinct docs necessarily has >=2 occurrences,
      // so boilerplate is a subset of q72's duplicated segments
      assert(nRem <= r.getAs[Long]("n_dup_paragraphs"))
      // the 3-word segmentation joined back with ' ' IS the original
      // text, so an untouched doc's cleaned fingerprint must round-trip
      if (nRem == 0L)
        assert(r.getAs[String]("cleaned_fp") == r.getAs[String]("orig_fp"))
      else
        assert(r.getAs[String]("cleaned_fp") != r.getAs[String]("orig_fp"))
    }
    // both populations exist on the fixture, or the test proves nothing
    assert(j.exists(_.getAs[Long]("n_removed") > 0L))
    assert(j.exists(_.getAs[Long]("n_removed") == 0L))
  }

  test("q110: every cluster elects its longest member exactly once, on " +
      "q67's exact component structure") {
    val dir = "/root/testdata/sf0.001"
    val out = graft.SparkEntry.queries("q110_quality_canonical")(spark, dir)
      .collect()
    val q67 = graft.SparkEntry.queries("q67_dedup_components")(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("component_id")).toMap
    val chars = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "n_chars").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_chars")).toMap
    // same membership and labels as the verified component query
    assert(out.map(r => r.getAs[Long]("doc_id") ->
      r.getAs[Long]("component_id")).toMap == q67)
    out.groupBy(_.getAs[Long]("component_id")).foreach {
      case (_, members) =>
        val canonicals = members.filter(_.getAs[Boolean]("is_canonical"))
        assert(canonicals.length == 1)
        val ids = members.map(_.getAs[Long]("doc_id"))
        val canonical = canonicals.head.getAs[Long]("doc_id")
        // every member row agrees on the winner, and the winner is the
        // member with max n_chars (min doc_id on ties)
        assert(members.forall(_.getAs[Long]("canonical_id") == canonical))
        val best = ids.maxBy(id => (chars(id), -id))
        assert(canonical == best)
        assert(members.forall(_.getAs[Long]("component_size") == ids.length))
    }
  }

  test("q112: near-dup pairs never straddle a split, singletons split as " +
      "q56 would, and the bucket rule is exactly recomputable") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("q112_leakage_safe_split")(
      spark, dir).collect()
    val split = rows.map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Long]("component_id"), r.getAs[String]("split"))).toMap
    assert(split.size == 500)
    val pairs = graft.SparkEntry.queries("q31_ngram_jaccard")(spark, dir)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(split(a)._2 == split(b)._2,
        s"near-dup pair ($a, $b) straddles ${split(a)._2}/${split(b)._2}")
    }
    // every doc splits by the first md5 hex char of its component id —
    // for cluster members that is the shared label, for everyone else
    // their own id (exactly q56's bucket of the doc id)
    val clustered = graft.SparkEntry.queries("q67_dedup_components")(
      spark, dir).collect().map(_.getAs[Long]("doc_id")).toSet
    def md5hex1(s: String): Char =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.head
    split.foreach { case (id, (comp, sp)) =>
      if (!clustered.contains(id)) assert(comp == id)
      val h = md5hex1(comp.toString)
      val want = if (h < 'c') "train" else if (h < 'e') "val" else "test"
      assert(sp == want)
    }
    // all three splits are populated on the fixture
    assert(rows.map(_.getAs[String]("split")).toSet ==
      Set("train", "val", "test"))
  }

  test("q114: the leakage audit recounts exactly — component bucketing " +
      "leaks zero pairs, doc-id bucketing leaks the recomputable count") {
    val dir = "/root/testdata/sf0.001"
    val r = graft.SparkEntry.queries("q114_split_leakage_audit")(
      spark, dir).collect()(0)
    val pairs = graft.SparkEntry.queries("q31_ngram_jaccard")(spark, dir)
      .collect().map(p => (p.getAs[Long]("doc_a"), p.getAs[Long]("doc_b")))
    def md5hex1(s: String): Char =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.head
    def split(id: Long): String = {
      val h = md5hex1(id.toString)
      if (h < 'c') "train" else if (h < 'e') "val" else "test"
    }
    assert(r.getAs[Long]("n_pairs") == pairs.length && pairs.nonEmpty)
    assert(r.getAs[Long]("leaky_docid_split") ==
      pairs.count { case (a, b) => split(a) != split(b) })
    // endpoints of a pair share a component, hence a bucket — zero leaks
    assert(r.getAs[Long]("leaky_component_split") == 0L)
  }

  test("q120: soft-dedup weights — every doc kept, each component's " +
      "weight mass is one doc's worth (up to the 1e-6 floor), and " +
      "eff_tokens is the truncated per-doc share") {
    val dir = "/root/testdata/sf0.001"
    val out = graft.SparkEntry.queries("q120_dup_weights")(spark, dir)
      .collect()
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    // soft dedup drops NOTHING — one weighted row per document
    assert(out.length.toLong == nDocs)
    out.groupBy(_.getAs[Long]("component_id")).foreach { case (_, rows) =>
      val size = rows.head.getAs[Long]("component_size")
      assert(rows.length.toLong == size)
      rows.foreach { r =>
        assert(r.getAs[Long]("component_size") == size)
        val w = r.getAs[Double]("weight")
        assert(w == math.floor(1e6 / size) / 1e6)
        assert(r.getAs[Double]("eff_tokens") ==
          math.floor(r.getAs[Long]("n_tokens") * 1e6 / size) / 1e6)
      }
      // the component's total loss mass ≈ 1.0, truncation-only low
      val mass = rows.map(_.getAs[Double]("weight")).sum
      assert(mass <= 1.0 + 1e-9 && mass >= 1.0 - size * 1e-6)
    }
    // singletons (the common case) weigh exactly 1.0
    assert(out.exists(r => r.getAs[Long]("component_size") == 1L &&
      r.getAs[Double]("weight") == 1.0))
  }

  test("q122: the per-source ledger is consistent with q120 — raw " +
      "tokens total the corpus, effective micro-tokens total q120's " +
      "weighted mass exactly, and inflation is never below 1") {
    val dir = "/root/testdata/sf0.001"
    val card = graft.SparkEntry.queries("q122_dup_inflation")(spark, dir)
      .collect()
    val perDoc = graft.SparkEntry.queries("q120_dup_weights")(spark, dir)
      .collect()
    assert(card.nonEmpty)
    assert(card.map(_.getAs[Long]("raw_tokens")).sum ==
      perDoc.map(_.getAs[Long]("n_tokens")).sum)
    // q120's eff_tokens is eff_micro/1e6 exactly, so the micro ledgers
    // must agree to the integer
    assert(card.map(_.getAs[Long]("eff_micro")).sum ==
      perDoc.map(r => math.round(r.getAs[Double]("eff_tokens") * 1e6)).sum)
    card.foreach { r =>
      assert(r.getAs[Double]("inflation") >= 1.0 - 1e-6,
        s"deflation at ${r.getAs[String]("source")}")
      assert(r.getAs[Long]("eff_micro") <=
        r.getAs[Long]("raw_tokens") * 1000000L)
    }
  }

  test("q134 substring excision: exact shared runs are cut at TOKEN " +
      "positions regardless of offset alignment, maximal overlapping " +
      "repeats merge, short docs and unique text survive untouched") {
    import spark.implicits._
    def words(prefix: String, n: Int): Seq[String] =
      (0 until n).map(i => s"$prefix$i")
    val run = words("dup", 10)            // the 10-token shared run
    val run2 = words("other", 8)          // a second, 8-token shared run
    // doc 1 carries the run at offset 2; doc 2 carries it at offset 5
    // (different alignments — a fixed 3-word tiling would disagree);
    // doc 2 also carries run2 separated by a unique gap (two spans);
    // doc 3 is unique; doc 4 is shorter than k
    val d1 = (words("a", 2) ++ run ++ words("b", 6)).mkString(" ")
    val d2 = (words("c", 5) ++ run ++ words("d", 4) ++ run2 ++
      words("e", 3)).mkString(" ")
    val d3 = words("f", 20).mkString(" ")
    val d4 = (words("g", 4) ++ run2.take(3)).mkString(" ")
    val d5 = (words("h", 1) ++ run2 ++ words("i", 2)).mkString(" ")
    val docs = Seq(1L -> d1, 2L -> d2, 3L -> d3, 4L -> d4, 5L -> d5)
      .toDF("doc_id", "text")
    val out = Dedup.substringExcise(docs, k = 8)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap

    // doc 1: exactly the 10 run tokens cut, one span, cleaned = rest
    assert(out(1L).getAs[Long]("dup_tokens") == 10)
    assert(out(1L).getAs[Long]("n_spans") == 1)
    val cleaned1 = (words("a", 2) ++ words("b", 6)).mkString(" ")
    assert(out(1L).getAs[String]("cleaned_fp") ==
      org.apache.commons.codec.digest.DigestUtils.md5Hex(cleaned1))
    // doc 2: both runs cut as TWO spans (the unique 4-token gap is
    // shorter than k so no shingle inside it is duplicated, but it
    // still separates the covered runs)
    assert(out(2L).getAs[Long]("dup_tokens") == 18)
    assert(out(2L).getAs[Long]("n_spans") == 2)
    // doc 5: run2 cut from its third carrier too (df counts distinct
    // docs, so a 3-way repeat still marks every carrier)
    assert(out(5L).getAs[Long]("dup_tokens") == 8)
    assert(out(5L).getAs[Long]("n_spans") == 1)
    // doc 3 unique, doc 4 shorter than any duplicated shingle: untouched
    assert(out(3L).getAs[Long]("dup_tokens") == 0)
    assert(out(4L).getAs[Long]("dup_tokens") == 0)
    assert(out(3L).getAs[Double]("removed_ratio") == 0.0)

    // overlap-merge: doc 6/7 share run ++ run2 ADJACENT — shingles
    // straddle the junction, so the whole 18 tokens merge into ONE span
    val d6 = (words("j", 3) ++ run ++ run2 ++ words("k", 2)).mkString(" ")
    val d7 = (run ++ run2).mkString(" ")
    val out2 = Dedup.substringExcise(
        Seq(6L -> d6, 7L -> d7).toDF("doc_id", "text"), k = 8)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out2(6L).getAs[Long]("dup_tokens") == 18)
    assert(out2(6L).getAs[Long]("n_spans") == 1,
      "adjacent shared runs must merge into one maximal span")
    assert(out2(7L).getAs[Long]("dup_tokens") == 18)
  }
}
