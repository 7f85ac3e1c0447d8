package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Layout (z-order clustering + stats-based file skipping): curve
  * arithmetic invariants, then the PHYSICAL twin of the q137 instrument —
  * a real `zOrderWrite`, real per-file min/max stats, and the proof that
  * reading only the pruned file list loses no rows while opening fewer
  * files than a linear layout on the off-axis predicate. */
class LayoutSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q136 z-curve: 16-bit range and exact bit-deinterleave round-trip") {
    val z = graft.SparkEntry.queries("q136_zorder_curve")(spark, sf)
      .localCheckpoint(true)
    assert(z.count() > 0)
    val bad = z.filter(col("zval") < 0 || col("zval") > 65535).count()
    assert(bad === 0, "z-value outside the 16-bit curve range")
    // de-interleave: even bits must reassemble xb, odd bits yb
    val evenBits = (0 until 8)
      .map(b => s"(((zval >> ${2 * b}) & 1) * ${1L << b})").mkString(" + ")
    val oddBits = (0 until 8)
      .map(b => s"(((zval >> ${2 * b + 1}) & 1) * ${1L << b})")
      .mkString(" + ")
    val broken = z.filter(expr(s"($evenBits) != xb OR ($oddBits) != yb"))
    assert(broken.count() === 0, "bit interleave does not round-trip")
  }

  test("physical z-order write: pruned read is lossless and beats the " +
      "linear layout on the off-axis and box predicates") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val files = 16
    val zDir = java.nio.file.Files.createTempDirectory("graft-zorder")
      .resolve("z").toString
    val linDir = java.nio.file.Files.createTempDirectory("graft-linear")
      .resolve("lin").toString
    Layout.zOrderWrite(li, "l_partkey", "l_suppkey", zDir, files)
    // linear strawman: same write path, clustered on l_partkey alone
    li.repartitionByRange(files, col("l_partkey"))
      .sortWithinPartitions("l_partkey")
      .write.mode("overwrite").parquet(linDir)

    val zStats = Layout.fileStats(spark, zDir, "l_partkey", "l_suppkey")
      .localCheckpoint(true)
    val linStats = Layout.fileStats(spark, linDir, "l_partkey", "l_suppkey")
      .localCheckpoint(true)
    assert(zStats.count() === files && linStats.count() === files)

    // the footer-only manifest read agrees with the data-derived stats
    // exactly (same file set, same bounds) — pruning needs no data scan
    val fromFooters = Layout.footerStats(spark, zDir, "l_partkey",
      "l_suppkey")
    def byBase(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("base", regexp_extract(col("file"), "[^/]+$", 0))
      .select("base", "fminx", "fmaxx", "fminy", "fmaxy")
    assert(byBase(fromFooters).exceptAll(byBase(zStats)).count() === 0)
    assert(byBase(zStats).exceptAll(byBase(fromFooters)).count() === 0)

    val Array(mny, mxy) = li.agg(min("l_suppkey"), max("l_suppkey"))
      .collect().head.toSeq.map(_.asInstanceOf[Long]).toArray
    val Array(mnx, mxx) = li.agg(min("l_partkey"), max("l_partkey"))
      .collect().head.toSeq.map(_.asInstanceOf[Long]).toArray
    val yr = (mny, mny + math.max((mxy - mny) / 8, 0L))
    val xr = (mnx + (mxx - mnx) * 7 / 16, mnx + (mxx - mnx) * 8 / 16)

    // off-axis predicate: linear (sorted by x) cannot skip on y
    val zY = Layout.prunedFiles(zStats, None, Some(yr)).count()
    val linY = Layout.prunedFiles(linStats, None, Some(yr)).count()
    assert(linY === files.toLong,
      "linear layout unexpectedly skipped on the unsorted column")
    assert(zY < linY, s"z-order must beat linear on y ($zY vs $linY)")

    // box predicate: the x-range spans 1/16 of the key space = exactly
    // one linear file, so this is LINEAR'S BEST CASE — z-order need not
    // beat it, only stay in the same small-file-count class (its win is
    // the off-axis predicate above, where linear reads everything)
    val zBox = Layout.prunedFiles(zStats, Some(xr), Some(yr)).count()
    val linBox = Layout.prunedFiles(linStats, Some(xr), Some(yr)).count()
    assert(zBox <= files / 4,
      s"z-order box read should stay O(sqrt(files)): $zBox of $files")
    assert(linBox <= files / 4)

    // losslessness: reading ONLY the pruned files + re-filtering equals
    // the full-scan filter, row for row
    val pruned = Layout.prunedFiles(zStats, Some(xr), Some(yr))
      .collect().map(_.getString(0))
    val viaPruned = spark.read.parquet(pruned: _*)
      .filter(col("l_partkey").between(xr._1, xr._2) &&
        col("l_suppkey").between(yr._1, yr._2))
      .select("l_orderkey", "l_linenumber")
    val viaFull = li
      .filter(col("l_partkey").between(xr._1, xr._2) &&
        col("l_suppkey").between(yr._1, yr._2))
      .select("l_orderkey", "l_linenumber")
    assert(viaPruned.exceptAll(viaFull).count() === 0)
    assert(viaFull.exceptAll(viaPruned).count() === 0)
    assert(viaFull.count() > 0, "empty box — predicate picked no rows")
  }

  test("q137 instrument: linear reads every file for the off-axis " +
      "predicate; z-order strictly beats it there and on the box — at " +
      "file AND row-group granularity") {
    val r = graft.SparkEntry.queries("q137_zorder_skipping")(spark, sf)
      .collect().head
    def g(c: String): Long = r.getAs[Long](c)
    val rgs = (Layout.FILES * Layout.RG_PER_FILE).toLong
    assert(g("files_linear") === Layout.FILES.toLong)
    assert(g("files_zorder") === Layout.FILES.toLong)
    assert(g("read_y_linear") === Layout.FILES.toLong,
      "rank-block linear layout should be stats-useless on y")
    assert(g("read_y_zorder") < g("read_y_linear"))
    assert(g("read_box_zorder") <= g("read_box_linear"))
    assert(g("read_x_linear") <= g("read_x_zorder"),
      "linear should stay unbeaten on its own sort column")
    assert(g("rows_box") > 0)
    // row-group granularity: same physics, 4x the units — the number a
    // parquet reader actually pays
    assert(g("rg_y_linear") === rgs,
      "linear row groups should be stats-useless on y")
    assert(g("rg_y_zorder") < g("rg_y_linear"))
    assert(g("rg_box_zorder") < rgs)
    assert(g("rg_x_linear") <= g("rg_x_zorder"))
    // block-granular skipping is at least as sharp as file-granular in
    // RELATIVE terms: opened-fraction at row-group level must not
    // exceed the file-level fraction on the z-layout's box read
    assert(g("rg_box_zorder") * Layout.FILES.toLong <=
      g("read_box_zorder") * rgs,
      "row-group pruning should refine, not coarsen, the file pruning")
  }

  test("bucket quantization: full 64-bit span does not overflow and " +
      "stays monotone in 0..255; small spans normalize to 0..255") {
    import spark.implicits._
    // wide span: mn=0, mx=Long.MaxValue-1 — the multiply-first form
    // would wrap; the CASE must route to divide-first and stay in range
    val mx = Long.MaxValue - 1
    val wide = Seq(0L, 1L, mx / 3, mx / 2, mx - 1, mx).toDF("c")
      .selectExpr(s"c", Layout.sparkBucketExpr("c", "0", mx.toString) +
        " AS b")
      .orderBy("c").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(wide.forall { case (_, b) => b >= 0 && b <= 255 },
      s"wide-span bucket out of 8-bit range: ${wide.mkString(",")}")
    assert(wide.map(_._2).toSeq === wide.map(_._2).sorted.toSeq,
      "bucketing must be monotone in the key")
    assert(wide.head._2 === 0L && wide.last._2 >= 200L,
      "wide-span buckets should still cover most of 0..255")
    // small span: 0..9 must SCALE UP to cover 0..255 (the normalization
    // the interleave's balance depends on)
    val small = (0L to 9L).toDF("c")
      .selectExpr(Layout.sparkBucketExpr("c", "0", "9") + " AS b")
      .collect().map(_.getLong(0))
    assert(small.min === 0L && small.max >= 230L,
      s"small-span buckets failed to normalize: ${small.mkString(",")}")
  }

  test("withZVal guards the signed-span limit loudly: a domain " +
      "touching both 64-bit extremes fails with a named error instead " +
      "of silently mis-bucketing") {
    import spark.implicits._
    val df = Seq((Long.MinValue, 1L), (Long.MaxValue, 2L))
      .toDF("k", "other")
    val err = intercept[IllegalArgumentException] {
      Layout.withZVal(df, "k", "other").count()
    }
    assert(err.getMessage.contains("signed"))
    // and a full POSITIVE 64-bit span still works (the spec above pins
    // the arithmetic; this pins the production entry point end-to-end)
    val ok = Layout.withZVal(
      Seq((0L, 0L), (Long.MaxValue - 1, 5L)).toDF("k", "other"),
      "k", "other")
    assert(ok.select("zval").collect().map(_.getLong(0))
      .forall(z => z >= 0 && z <= 65535))
  }

  test("physical block-granular footer stats: per-row-group bounds " +
      "nest in file bounds, reassemble them exactly, and prune finer " +
      "than whole files") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val zDir = java.nio.file.Files.createTempDirectory("graft-zrg")
      .resolve("z").toString
    // small block cap -> several row groups per file, the shape the
    // instrument exists to measure (at 100 TB it exists naturally)
    Layout.zOrderWrite(li, "l_partkey", "l_suppkey", zDir, files = 4,
      blockBytes = Some(16 * 1024))
    val fileList = {
      val fs = new org.apache.hadoop.fs.Path(zDir).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      fs.listStatus(new org.apache.hadoop.fs.Path(zDir))
        .map(_.getPath).filter(_.getName.endsWith(".parquet"))
        .map(_.toString).toSeq
    }
    val blocks = Layout.footerBlockStats(spark, fileList,
      "l_partkey", "l_suppkey").localCheckpoint(true)
    val nFiles = fileList.size.toLong
    val nBlocks = blocks.count()
    assert(nBlocks > nFiles, s"expected multiple row groups per file " +
      s"($nBlocks blocks over $nFiles files)")
    // block bounds reassemble the file bounds exactly
    val reassembled = blocks.groupBy("file")
      .agg(min("fminx").as("fminx"), max("fmaxx").as("fmaxx"),
        min("fminy").as("fminy"), max("fmaxy").as("fmaxy"))
    val fileStats = Layout.footerStats(spark, zDir, "l_partkey",
      "l_suppkey")
    assert(reassembled.exceptAll(fileStats).count() === 0)
    assert(fileStats.exceptAll(reassembled).count() === 0)
    // block-level pruning on the box opens fewer row groups than the
    // opened files contain — the refinement the extension is for
    val Array(mnx, mxx) = li.agg(min("l_partkey"), max("l_partkey"))
      .collect().head.toSeq.map(_.asInstanceOf[Long]).toArray
    val Array(mny, mxy) = li.agg(min("l_suppkey"), max("l_suppkey"))
      .collect().head.toSeq.map(_.asInstanceOf[Long]).toArray
    val xr = (mnx + (mxx - mnx) * 7 / 16, mnx + (mxx - mnx) * 8 / 16)
    val yr = (mny + (mxy - mny) * 7 / 16, mny + (mxy - mny) * 8 / 16)
    val openedFiles = Layout.prunedFiles(fileStats, Some(xr), Some(yr))
      .collect().map(_.getString(0)).toSet
    val openedBlocks = Layout.prunedRowGroups(blocks, Some(xr), Some(yr))
      .localCheckpoint(true)
    val blocksInOpenedFiles = blocks
      .filter(col("file").isin(openedFiles.toSeq: _*)).count()
    assert(openedBlocks.count() < blocksInOpenedFiles,
      "row-group stats should skip blocks inside opened files")
    // and every opened block lives in an opened file (consistency)
    assert(openedBlocks.filter(!col("file").isin(openedFiles.toSeq: _*))
      .count() === 0)
  }
}
