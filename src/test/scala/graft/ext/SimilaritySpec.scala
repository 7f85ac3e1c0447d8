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
}
