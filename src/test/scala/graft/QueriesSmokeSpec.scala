package graft

/** Smoke regression: every registered query executes at sf0.001 and its
  * oracle pairing rules hold (the driver's entry check generalized). */
class QueriesSmokeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle keys are a subset of query keys") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet.diff(qs)
    assert(orphans.isEmpty, s"oracleSql without queries: $orphans")
  }

  for (name <- SparkEntry.queries.keys.toSeq.sorted) {
    test(s"$name executes and returns rows at sf0.001") {
      val n = SparkEntry.queries(name)(spark, sf).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }
}
