package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for specs — one JVM-wide session (Spark
  * getOrCreate), UTC, small shuffle fan-out, nanos-tolerant parquet. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
}

object SparkSpec {
  lazy val session: SparkSession = {
    // SessionTuning: the specs run under the same I/O-layer configs as
    // Verify/Bench (raw local FS, driver-side listing), so any behavior
    // difference those configs could introduce is covered by the suite
    val s = graft.core.SessionTuning(SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .config("spark.sql.shuffle.partitions", "4")
      // the production wiring (Verify/Bench run with it too): TVFs,
      // native expressions, pruning rules, and the MERGE INTO DML
      // route are all exercised under the same extension point
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
