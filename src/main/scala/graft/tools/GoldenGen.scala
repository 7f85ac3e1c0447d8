package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dev-only generator for the golden files backing the one remaining
  * rows-only (no-SQL-oracle) query, q20 (HLL sketch internals — its
  * register layout is engine-private, structurally un-oracle-able).
  * Run once, review the output, commit it under
  * src/test/resources/golden/<sf>/ — GoldenSpec then pins the query
  * to byte-identical results forever, closing the "no_oracle" gap with
  * a hard deterministic check. (q32/q33 converted to full oracles in
  * round 5 via the engine-portable md5-slice hash; q35 in round 8 via
  * the integer hyperplane re-seed.)
  *
  * Two scale factors are pinned: sf0.001 (the fast dev loop) AND sf0.1
  * (the BENCH scale) — sketch contents are data-dependent, so drift
  * that only manifests at the larger corpus must fail hard too, not
  * just at the toy scale.
  *
  * Determinism: the query is a pure function of its fixture and ends
  * in a total ORDER BY, so the JSON-lines dump is stable across runs,
  * partitionings, and core counts.
  */
object GoldenGen {
  val goldenQueries: Seq[String] =
    Seq("q20_approx_distinct")
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
