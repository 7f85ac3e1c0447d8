package graft.ext

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {

  test("q70: widening nprobe never loses recall, and the mean reflects it") {
    val rows = graft.SparkEntry
      .queries("q70_ann_recall")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    // per-query monotonicity: an exact-top-5 member reachable at
    // nprobe=1 is never displaced by widening the probe set
    rows.foreach { r =>
      assert(r.getAs[Long]("hits2") >= r.getAs[Long]("hits1"))
      assert(r.getAs[Double]("recall2") >= r.getAs[Double]("recall1"))
    }
    val m1 = rows.head.getAs[Double]("mean_recall1")
    val m2 = rows.head.getAs[Double]("mean_recall2")
    assert(m2 >= m1)
    // recall is a ratio of hits out of 5
    rows.foreach { r =>
      assert(r.getAs[Double]("recall1") ==
        r.getAs[Long]("hits1").toDouble / 5.0)
    }
  }

  test("q70: recall against ground truth is bounded by construction") {
    val rows = graft.SparkEntry
      .queries("q70_ann_recall")(spark, "/root/testdata/sf0.001")
      .collect()
    rows.foreach { r =>
      val h = r.getAs[Long]("hits2")
      assert(h >= 0L && h <= 5L)
    }
  }

  test("q81: every vector assigned once, 8 live cells, and two Lloyd " +
      "rounds beat the seed codebook's distortion") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("q81_kmeans_codebook")(spark, dir)
      .collect()
    // independent ground-truth math in plain Scala on the same grid
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Float]]("embedding")
          .map(x => math.round(x.toDouble * 1000)).toArray)
      .toMap
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val seed = (0L until 8L).map(vecs)
    val seedDistortion = vecs.values.map(v => seed.map(d2(v, _)).min).sum
    assert(rows.length == vecs.size)
    assert(rows.map(_.getAs[Int]("cell")).distinct.sorted.toSeq
      == (0 until 8))
    // cell_size is the exact member count, so sizes partition the corpus
    assert(rows.groupBy(_.getAs[Int]("cell")).forall { case (_, g) =>
      g.forall(_.getAs[Long]("cell_size") == g.length.toLong)
    })
    val trainedDistortion = rows.map(_.getAs[Long]("d2")).sum
    assert(trainedDistortion <= seedDistortion,
      s"trained $trainedDistortion > seed $seedDistortion")
    // and each reported d2 is the true distance to SOME grid centroid:
    // nonnegative and no better than the seed-optimal for that vector
    rows.foreach(r => assert(r.getAs[Long]("d2") >= 0L))
  }
}
