package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** TIMESTAMP time travel: in-commit timestamps (`#ts=` manifest
  * lines), strictly monotonized against writer clock skew, resolved
  * by versionAsOf / readTableAsOf / the merge_table_as_of SQL TVF. */
class TimestampTravelSpec extends SparkSpec {

  private def mkTable(): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ts")
      .resolve("t").toString
    MergeTable.create(
      (1 to 100).map(i => (i.toLong, i.toLong)).toDF("key", "n"),
      dir, "key", hexDigits = 1)
    MergeTable.upsert(spark, dir,
      Seq((101L, 101L)).toDF("key", "n")) // v2
    MergeTable.upsert(spark, dir,
      Seq((102L, 102L)).toDF("key", "n")) // v3
    dir
  }

  test("each version's effective timestamp resolves to itself; " +
      "between-commit probes resolve DOWN; pre-history refuses " +
      "loudly; the far future reads the head") {
    val dir = mkTable()
    val times = MergeTable.commitTimes(spark, dir)
    assert(times.map(_._1) === Seq(1L, 2L, 3L))
    assert(times.map(_._2) === times.map(_._2).sorted)
    assert(times.map(_._2).distinct.size === 3)
    times.foreach { case (v, ts) =>
      assert(MergeTable.versionAsOf(spark, dir, ts) === v)
      assert(MergeTable.readTableAsOf(spark, dir, ts).count() ===
        99L + v)
    }
    // strictly between two commits → the earlier one
    val mid = (times(1)._2 + times(2)._2) / 2
    if (mid > times(1)._2 && mid < times(2)._2)
      assert(MergeTable.versionAsOf(spark, dir, mid) === 2L)
    assert(MergeTable.versionAsOf(spark, dir,
      times.last._2 + 86400000L) === 3L)
    val e = intercept[IllegalArgumentException] {
      MergeTable.versionAsOf(spark, dir, times.head._2 - 1)
    }
    assert(e.getMessage.contains("vacuumed"))
  }

  test("writer clock SKEW cannot reorder history: a mid-history " +
      "commit stamped in the future still yields strictly " +
      "increasing effective times (later commits monotonize past it)") {
    val dir = mkTable()
    // simulate a skewed writer: rewrite v2's #ts to one hour ahead
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mp = new org.apache.hadoop.fs.Path(s"$dir/_manifests/v000000002")
    val in = fs.open(mp)
    val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().toList finally in.close()
    val skewed = lines.map(l =>
      if (l.startsWith("#ts="))
        s"#ts=${l.drop(4).toLong + 3600L * 1000L}" else l)
    fs.delete(mp, false)
    val out = fs.create(mp, true)
    try out.write(skewed.mkString("\n").getBytes("UTF-8"))
    finally out.close()
    // in-place tampering breaks the manifest-immutability contract the
    // raw-clock cache rides on — drop it, as any out-of-band editor must
    MergeTable.invalidateTimestampCache(dir)
    val times = MergeTable.commitTimes(spark, dir)
    assert(times.map(_._2) === times.map(_._2).sorted)
    assert(times.map(_._2).distinct.size === 3)
    // v3's effective time is v2's + 1 (raw went backwards)
    assert(times(2)._2 === times(1)._2 + 1)
    assert(MergeTable.versionAsOf(spark, dir, times(2)._2) === 3L)
  }

  test("a new commit anchors its persisted #ts= on the predecessor's " +
      "EFFECTIVE time (not its raw clock), so AS OF resolution to " +
      "retained versions is stable across vacuum even over a skewed " +
      "legacy prefix") {
    import spark.implicits._
    val dir = mkTable()
    // skew v2's raw clock one hour into the future (out-of-band edit:
    // drop the table's cached clocks, as any such editor must)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mp = new org.apache.hadoop.fs.Path(s"$dir/_manifests/v000000002")
    val in = fs.open(mp)
    val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().toList finally in.close()
    val out = fs.create(mp, true)
    try out.write(lines.map(l =>
      if (l.startsWith("#ts=")) s"#ts=${l.drop(4).toLong + 3600000L}"
      else l).mkString("\n").getBytes("UTF-8"))
    finally out.close()
    MergeTable.invalidateTimestampCache(dir)
    val pre = MergeTable.commitTimes(spark, dir).toMap // v3 eff > now+1h
    MergeTable.upsert(spark, dir,
      Seq((103L, 103L)).toDF("key", "n")) // v4, written by this engine
    // the PERSISTED raw clock of v4 must clear v3's EFFECTIVE time —
    // a raw-anchored writer would stamp wall-clock (an hour short)
    // and leave stability to read-time repair that vacuum undoes
    MergeTable.invalidateTimestampCache(dir)
    val eff4 = MergeTable.commitTimes(spark, dir).toMap
    assert(eff4(4L) === pre(3L) + 1,
      "v4's anchor must ride the effective chain past the skew")
    val rawLine = {
      val p = new org.apache.hadoop.fs.Path(s"$dir/_manifests/v000000004")
      val i = fs.open(p)
      try scala.io.Source.fromInputStream(i, "UTF-8").getLines()
        .find(_.startsWith("#ts=")).get.drop(4).toLong
      finally i.close()
    }
    assert(rawLine === pre(3L) + 1, "persisted, not read-time-repaired")
    // expire v1-v2 (the skew source); retained resolution must not move
    val st = MergeTable.vacuum(spark, dir, retainVersions = 2,
      minFileAgeMs = 0L)
    assert(st.versionsLive === 2L)
    assert(MergeTable.versionAsOf(spark, dir, pre(3L)) === 3L)
    assert(MergeTable.versionAsOf(spark, dir, eff4(4L)) === 4L)
  }

  test("merge_table_as_of SQL TVF: timestamp literals and string " +
      "forms resolve through the same monotone clock; garbage " +
      "refuses with parse guidance") {
    val dir = mkTable()
    val times = MergeTable.commitTimes(spark, dir)
    val iso = java.time.Instant.ofEpochMilli(times(1)._2).toString
    val viaIso = spark.sql(
      s"SELECT count(*) AS c FROM merge_table_as_of('$dir', '$iso')")
      .collect().head.getLong(0)
    assert(viaIso === 101L)
    // TIMESTAMP literal (session tz is UTC)
    val lit = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
      .format(java.time.LocalDateTime.ofInstant(
        java.time.Instant.ofEpochMilli(times(2)._2),
        java.time.ZoneOffset.UTC))
    val viaTs = spark.sql(
      s"""SELECT count(*) AS c
         |FROM merge_table_as_of('$dir', TIMESTAMP '$lit')""".stripMargin)
      .collect().head.getLong(0)
    assert(viaTs === 102L)
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM merge_table_as_of('$dir', 'yesterday')")
        .collect()
    }
    assert(e.getMessage.contains("cannot parse timestamp"))
    // history exposes the effective clock as commit_ts
    val hist = spark.sql(
      s"SELECT v, commit_ts FROM merge_table_history('$dir') ORDER BY v")
      .collect()
    assert(hist.length === 3)
    assert(hist.map(_.getTimestamp(1).getTime).toSeq ===
      times.map(_._2))
  }
}
