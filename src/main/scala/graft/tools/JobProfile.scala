package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev-only profiling harness (guide §1): runs a query once warm, then
  * once measured with a SparkListener attached, and prints every Spark
  * job's wall time + description plus the DRIVER GAP — wall time not
  * covered by any job (manifest IO, planning, listing, collect decode).
  * Separates "many small jobs" from "driver-side work" for the
  * lifecycle cells whose cost is invisible in a single plan. */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    // same session shape as Bench (incl. the SessionTuning I/O configs,
    // overridable via the same SPARK_GRAFT_* env knobs for A/B runs)
    val spark = graft.core.SessionTuning(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.length > 1) args.drop(1).toSeq
                else Seq("q170_typed_stats_pruning")
    for (n <- names) {
      val fn = graft.SparkEntry.queries(n)
      // warmup (JIT, codegen, footer caches) — same as Bench
      fn(spark, sfDir).count()

      case class Job(id: Int, desc: String, start: Long, var end: Long)
      val jobs = new java.util.concurrent.ConcurrentLinkedQueue[Job]()
      val byId = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
      val listener = new SparkListener {
        override def onJobStart(js: SparkListenerJobStart): Unit = {
          val d = Option(js.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .orElse(Option(js.properties)
              .flatMap(p => Option(p.getProperty("callSite.short"))))
            .orElse(js.stageInfos.lastOption.map(si =>
              si.name + " | " + si.details.linesIterator.toSeq
                .filter(l => l.contains("graft") && !l.contains("JobProfile"))
                .take(2).mkString(" <- ").trim))
            .getOrElse("?")
          val j = Job(js.jobId, d, System.nanoTime(), 0L)
          jobs.add(j); byId.put(js.jobId, j): Unit
        }
        override def onJobEnd(je: SparkListenerJobEnd): Unit = {
          Option(byId.get(je.jobId)).foreach(_.end = System.nanoTime())
        }
      }
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val cnt = fn(spark, sfDir).count()
      val total = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      Thread.sleep(200) // let listener events drain

      import scala.jdk.CollectionConverters._
      val js = jobs.asScala.toSeq.filter(_.end > 0).sortBy(_.start)
      // union of job intervals -> covered seconds (jobs can overlap)
      val iv = js.map(j => (j.start, j.end)).sortBy(_._1)
      var covered = 0L; var curS = 0L; var curE = 0L
      for ((s, e) <- iv) {
        if (s > curE) { covered += curE - curS; curS = s; curE = e }
        else if (e > curE) curE = e
      }
      covered += curE - curS
      println(f"[profile] $n total=$total%.2f s jobs=${js.size} " +
        f"covered=${covered / 1e9}%.2f s driverGap=${total - covered / 1e9}%.2f s rows=$cnt")
      js.sortBy(j => -(j.end - j.start)).take(30).foreach { j =>
        println(f"[profile]   job ${j.id}%4d ${(j.end - j.start) / 1e9}%7.3f s  ${j.desc.take(110)}")
      }
    }
    spark.stop()
  }
}
