package graft

import scala.io.Source

/** Hard deterministic check for the one query the driver can only
  * rows-check (no DuckDB-expressible oracle): q20, whose HLL sketch
  * register layout is engine-private. Expected outputs were generated
  * once by graft.tools.GoldenGen at sf0.001 AND sf0.1 (the bench
  * scale — sketch drift that only manifests on the larger corpus must
  * also fail hard), reviewed, and committed — any drift in sketch
  * contents or ordering fails here even though the oracle gate records
  * the query as rows-only. */
class GoldenSpec extends SparkSpec {

  private def golden(sfName: String, name: String): Seq[String] = {
    val src = Source.fromResource(s"golden/$sfName/$name.jsonl")
    try src.getLines().toVector finally src.close()
  }

  for ((sfName, dir) <- graft.tools.GoldenGen.sfDirs;
       name <- graft.tools.GoldenGen.goldenQueries)
    test(s"$name matches its committed golden output at $sfName") {
      val got = SparkEntry.queries(name)(spark, dir).toJSON.collect().toSeq
      val want = golden(sfName, name)
      assert(got.length == want.length,
        s"row count ${got.length} != golden ${want.length}")
      for (((g, w), i) <- got.zip(want).zipWithIndex)
        assert(g == w, s"row $i differs:\n  got    $g\n  golden $w")
    }
}
