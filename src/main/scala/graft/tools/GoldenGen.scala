package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dev-only generator for the golden files backing the two rows-only
  * (no-SQL-oracle) queries. Run once, review the output, commit it under
  * src/test/resources/golden/<sf>/ — GoldenSpec then pins those queries
  * to byte-identical results forever, closing the "no_oracle" gap with a
  * hard deterministic check.
  *
  * Two scale factors are pinned: sf0.001 (the fast dev loop) AND sf0.1
  * (the BENCH scale) — q32's banding, q33's bit votes, and q35's
  * hyperplanes are all data-dependent, so drift that only manifests at
  * the larger corpus (e.g. a plane-count boundary, a band-key collision
  * regime) must fail hard too, not just at the toy scale.
  *
  * Determinism: all four queries are pure functions of their fixture
  * (hash/sketch arithmetic + seeded hyperplanes), and each ends in a
  * total ORDER BY, so the JSON-lines dump is stable across runs,
  * partitionings, and core counts.
  */
object GoldenGen {
  val goldenQueries: Seq[String] =
    Seq("q20_approx_distinct", "q35_knn_lsh")
  val sfDirs: Seq[(String, String)] = Seq(
    "sf0.001" -> "/root/testdata/sf0.001",
    "sf0.1" -> "/root/testdata/sf0.1")
  val sfDir: String = sfDirs.head._2

  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("src/test/resources/golden")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for ((sfName, dir) <- sfDirs) {
      Files.createDirectories(Paths.get(s"$outDir/$sfName"))
      for (name <- goldenQueries) {
        val lines = graft.SparkEntry.queries(name)(spark, dir)
          .toJSON.collect()
        Files.write(Paths.get(s"$outDir/$sfName/$name.jsonl"),
          lines.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
        println(s"[golden] wrote $sfName/$name: ${lines.length} rows")
      }
    }
    spark.stop()
  }
}
