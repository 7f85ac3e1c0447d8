package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dev-only generator for the golden files backing the four rows-only
  * (no-SQL-oracle) queries. Run once, review the output, commit it under
  * src/test/resources/golden/ — GoldenSpec then pins those queries to
  * byte-identical results forever, closing the "no_oracle" gap with a
  * hard deterministic check.
  *
  * Determinism: all four queries are pure functions of the sf0.001
  * fixture (hash/sketch arithmetic + seeded hyperplanes), and each ends
  * in a total ORDER BY, so the JSON-lines dump is stable across runs,
  * partitionings, and core counts.
  */
object GoldenGen {
  val goldenQueries: Seq[String] =
    Seq("q20_approx_distinct", "q32_minhash_lsh", "q33_simhash", "q35_knn_lsh")
  val sfDir = "/root/testdata/sf0.001"

  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("src/test/resources/golden")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    for (name <- goldenQueries) {
      val lines = graft.SparkEntry.queries(name)(spark, sfDir)
        .toJSON.collect()
      Files.write(Paths.get(s"$outDir/$name.jsonl"),
        lines.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
      println(s"[golden] wrote $name: ${lines.length} rows")
    }
    spark.stop()
  }
}
