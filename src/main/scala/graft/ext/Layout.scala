package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{QueryDef, Tables}

/** Data LAYOUT for scan pruning — multi-dimensional clustering (z-order)
  * so that min/max file statistics skip files on EITHER of two predicate
  * columns, not just the one the data happens to be sorted by.
  *
  * Why this is a first-class 100 TB operator: every immutable-file store
  * (parquet footers, Iceberg/Delta manifests) prunes scans with per-file
  * min/max stats, and stats only skip when the layout CLUSTERS values.
  * A linear sort clusters exactly one column — a predicate on any other
  * column degenerates to a full-file-list scan. Interleaving the bit
  * representations of two rank-quantized columns (the Morton / z-order
  * curve, Orenstein & Merrett 1984 — the same layout behind Delta
  * OPTIMIZE ZORDER and Iceberg's sort-order curves) bounds BOTH
  * dimensions inside each curve range, so a 64-file table answers an
  * either-column range predicate from O(sqrt(files)) files instead of
  * all of them. The price, measured honestly by q137 below: single-
  * column pruning on the formerly-sorted column gets WORSE than the
  * linear layout (the curve trades its perfection on one axis for
  * usefulness on both), which is why a layout choice is a workload
  * decision, not a default.
  *
  * Scale shape: [[zOrderWrite]] is ONE distributed range exchange
  * (`repartitionByRange` on the curve key: sampled bounds, no global
  * single-partition sort) + a within-partition sort — the exact cost
  * profile of a table OPTIMIZE job. Serving needs nothing custom:
  * parquet row-group stats + any manifest-level min/max index do the
  * skipping; [[fileStats]]/[[prunedFiles]] make that reader-side
  * arithmetic explicit and spec-checkable. The q137 instrument models
  * file assignment as contiguous rank blocks — semantically what
  * `repartitionByRange` + sort produces over a unique sort key — so the
  * whole claim is DuckDB-oracle-checkable; LayoutSpec then performs the
  * REAL write and asserts the physical per-file stats skip the same way.
  *
  * Curve arithmetic (shared verbatim with the DuckDB oracle, rendered
  * from one generator so the two engines cannot drift): each dimension
  * is equi-width-quantized to 8 bits over its observed [min, max] span,
  * and the 16-bit z-value interleaves the bits, x in the even positions,
  * y in the odd. 8 bits/dim is the file-skipping sweet spot: 2^16 curve
  * cells >> any practical file count, while the quantization keeps the
  * arithmetic in exact BIGINT range for any 64-bit key span.
  */
object Layout {

  /** Files the acceptance instrument models; also the spec's write
    * width. 64 keeps per-file row counts meaningful at sf0.01. */
  val FILES = 64

  /** Modeled row groups per file in the q137 instrument: parquet
    * readers skip at ROW-GROUP granularity, so the acceptance row
    * prices both "files opened" (manifest-level pruning) and
    * "row groups opened" (what a reader actually pays) — 4 groups per
    * file, assigned as contiguous rank sub-blocks, exactly how a
    * sorted parquet write lays its groups out. */
  val RG_PER_FILE = 4

  private val BITS = 8

  /** Equi-width 8-bit bucket of `c` over span [`mn`, `mx`] — exact
    * BIGINT arithmetic (never a double divide: a 64-bit key's bucket
    * must not round), in two span-conditional forms because each fails
    * where the other is right:
    *
    *  - spans below 2^55: MULTIPLY-FIRST `(c - mn) * 256 / (span + 1)`,
    *    which NORMALIZES any span to the full 0..255 range — load-
    *    bearing for the interleave: a dimension left un-normalized
    *    (say suppkey's 0..9 against partkey's 0..199) occupies only
    *    the LOW bits of the z-value, the curve degenerates to a sort
    *    on the wider dimension, and off-axis skipping vanishes
    *    (measured: the divide-only form lost ALL y-file skipping on
    *    the sf0.001 physical write);
    *  - spans at or above 2^55: DIVIDE-FIRST `(c - mn) / ceil-width`,
    *    because multiply-first silently wraps 64-bit arithmetic there
    *    and yields wrong z-values on wide-domain keys — and at that
    *    magnitude the quotient already lands on ~0..255, so the
    *    normalization multiply-first existed for is free.
    *
    * CASE evaluates lazily in both dialects, so the untaken multiply
    * never overflows. Remaining documented limit: the SPAN itself must
    * fit a signed 64-bit value — a domain touching both extremes
    * (min < 0 and max > 0 with mx - mn ≥ 2^63) wraps the span
    * negative before either branch runs; [[withZVal]] guards it
    * loudly (real key domains sit far inside). `divOp` renders the
    * integer-division operator of the target dialect: Spark spells it
    * `DIV`, DuckDB `//`. */
  private[ext] def bucketSql(c: String, mn: String, mx: String,
      divOp: String): String =
    s"CAST(CASE WHEN ($mx - $mn) < ${1L << 55} " +
      s"THEN (($c - $mn) * ${1 << BITS}) $divOp ($mx - $mn + 1) " +
      s"ELSE ($c - $mn) $divOp ((($mx - $mn) $divOp ${1 << BITS}) + 1) " +
      "END AS BIGINT)"

  /** Bit interleave of two 8-bit buckets — x even bits, y odd. Rendered
    * as shift/mask/multiply terms valid in BOTH dialects, so the oracle
    * restates the identical expression. */
  private def zSql(xb: String, yb: String): String =
    (0 until BITS).flatMap { b =>
      Seq(s"((($xb >> $b) & 1) * ${1L << (2 * b)})",
        s"((($yb >> $b) & 1) * ${1L << (2 * b + 1)})")
    }.mkString("(", " + ", ")")

  private def sparkBucket(c: String, mn: String, mx: String): String =
    bucketSql(c, mn, mx, "DIV")
  private def duckBucket(c: String, mn: String, mx: String): String =
    bucketSql(c, mn, mx, "//")

  /** Spec accessors: evaluate the rendered Spark-dialect expressions
    * over literal values (LayoutSpec pins the no-overflow claim on a
    * full 64-bit span and bit-compatibility between the dialects). */
  private[ext] def sparkBucketExpr(c: String, mn: String,
      mx: String): String = sparkBucket(c, mn, mx)
  private[ext] def zExpr(xb: String, yb: String): String = zSql(xb, yb)

  /** Attach the z-value of (`xCol`, `yCol`) with data-derived bounds —
    * the curve generator as a reusable projection. The bounds are ONE
    * row; collecting them costs one cheap min/max job and lets the
    * main pass inline them as LITERALS (no join at all in the layout
    * write's plan) while also guarding the signed-span limit loudly:
    * a domain whose span wraps 64-bit arithmetic (min < 0, max > 0 at
    * the extremes) would mis-bucket silently otherwise. Callers sort
    * or range-exchange on `zval` and drop it before landing the data
    * ([[zOrderWrite]]; [[MergeTable.optimizeZOrder]]). */
  def withZVal(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    // public-API guards (optimizeZOrder routes arbitrary tables here):
    // the curve arithmetic is 64-bit integer bucketing, so clustering
    // columns must be integral — a fractional column would silently
    // cluster on truncated values — and an empty input has no bounds
    // to collect (getLong on the all-null agg row would NPE opaquely)
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    Seq(xCol, yCol).foreach { c =>
      val dt = df.schema(c).dataType
      require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
        s"z-order on $c: clustering columns must be integral " +
          s"(byte/short/int/long), got ${dt.simpleString}")
    }
    val b = df.agg(
      min(col(xCol).cast("long")).as("mnx"),
      max(col(xCol).cast("long")).as("mxx"),
      min(col(yCol).cast("long")).as("mny"),
      max(col(yCol).cast("long")).as("mxy")).collect().head
    require(!b.isNullAt(0) && !b.isNullAt(2),
      s"z-order on ($xCol, $yCol): the input is EMPTY (or the " +
        "clustering columns are all-null) — no bounds exist to build " +
        "the curve over")
    val (mnx, mxx, mny, mxy) =
      (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
    def guard(c: String, mn: Long, mx: Long): Unit =
      require(mx - mn >= 0,
        s"z-order on $c: the domain span [$mn, $mx] exceeds signed " +
          "64-bit arithmetic and would mis-bucket — shift or split the " +
          "key domain first")
    guard(xCol, mnx, mxx); guard(yCol, mny, mxy)
    df.withColumn("xb",
        expr(sparkBucket(xCol, s"${mnx}L", s"${mxx}L")))
      .withColumn("yb",
        expr(sparkBucket(yCol, s"${mny}L", s"${mxy}L")))
      .withColumn("zval", expr(zSql("xb", "yb")))
      .drop("xb", "yb")
  }

  /** N-ARY round-robin bit interleave: bit `b` of dimension `i` lands
    * at position `b*k + i` — the k=2 instance is value-identical to
    * [[zSql]]'s x-even/y-odd layout (dimension 0 takes the even
    * positions), so the binary curve is the n=2 special case and a
    * 2-column layout built through either path sorts identically.
    * 8 bits per dimension keeps k ≤ 7 inside signed-64 arithmetic
    * (56 curve bits). Rendered in shift/mask/multiply terms valid in
    * BOTH dialects, the [[zSql]] discipline. */
  private def zSqlN(bs: Seq[String]): String = {
    val k = bs.size
    bs.zipWithIndex.flatMap { case (b, i) =>
      (0 until BITS).map(bit =>
        s"((($b >> $bit) & 1) * ${1L << (k * bit + i)})")
    }.mkString("(", " + ", ")")
  }
  private[ext] def zExprN(bs: Seq[String]): String = zSqlN(bs)

  /** [[withZVal]] at n dimensions (2..7): equi-width 8-bit buckets
    * per column over data-derived bounds (one min/max job for ALL
    * dimensions — still a single cheap aggregate at any scale),
    * round-robin interleave, same overflow guards. Callers sort or
    * range-exchange on `zval` and drop it. */
  def withZValN(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2 && cols.size <= 7,
      s"z-order takes 2..7 clustering columns, got ${cols.size}")
    require(cols.distinct.size == cols.size,
      s"duplicate z-order columns: ${cols.mkString(",")}")
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType,
      ShortType}
    cols.foreach { c =>
      val dt = df.schema(c).dataType
      require(Seq(ByteType, ShortType, IntegerType, LongType)
          .contains(dt),
        s"z-order on $c: clustering columns must be integral " +
          s"(byte/short/int/long), got ${dt.simpleString}")
    }
    val aggs = cols.flatMap(c => Seq(
      min(col(c).cast("long")), max(col(c).cast("long"))))
    val b = df.agg(aggs.head, aggs.tail: _*).collect().head
    val bounds = cols.zipWithIndex.map { case (c, i) =>
      require(!b.isNullAt(2 * i),
        s"z-order on $c: the input is EMPTY (or the clustering " +
          "column is all-null) — no bounds exist to build the curve")
      val (mn, mx) = (b.getLong(2 * i), b.getLong(2 * i + 1))
      require(mx - mn >= 0,
        s"z-order on $c: the domain span [$mn, $mx] exceeds signed " +
          "64-bit arithmetic and would mis-bucket — shift or split " +
          "the key domain first")
      (c, mn, mx)
    }
    val bNames = cols.indices.map(i => s"__zb$i")
    val withB = bounds.zip(bNames).foldLeft(df) {
      case (d, ((c, mn, mx), bn)) =>
        d.withColumn(bn, expr(sparkBucket(c, s"${mn}L", s"${mx}L")))
    }
    withB.withColumn("zval", expr(zSqlN(bNames)))
      .drop(bNames: _*)
  }

  /** lineitem with bounds + 8-bit buckets + z-value attached — the
    * shared front half of q136/q137. Bounds ride a one-row broadcast
    * (an O(1) relation at any scale). */
  private def curveFrame(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir, "lineitem")
    val bounds = li.agg(
      min("l_partkey").as("mnx"), max("l_partkey").as("mxx"),
      min("l_suppkey").as("mny"), max("l_suppkey").as("mxy"))
    li.crossJoin(broadcast(bounds))
      .withColumn("xb", expr(sparkBucket("l_partkey", "mnx", "mxx")))
      .withColumn("yb", expr(sparkBucket("l_suppkey", "mny", "mxy")))
      .withColumn("zval", expr(zSql("xb", "yb")))
  }

  private val curveCte =
    s"""b AS (SELECT min(l_partkey) AS mnx, max(l_partkey) AS mxx,
       |            min(l_suppkey) AS mny, max(l_suppkey) AS mxy
       |     FROM lineitem),
       |g AS (SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
       |             ${duckBucket("l_partkey", "mnx", "mxx")} AS xb,
       |             ${duckBucket("l_suppkey", "mny", "mxy")} AS yb
       |      FROM lineitem, b),
       |z AS (SELECT *, ${zSql("xb", "yb")} AS zval FROM g)""".stripMargin

  /** q136 — the curve itself, row by row: 8-bit quantization of
    * (l_partkey, l_suppkey) and the interleaved 16-bit z-value for every
    * lineitem row. Pins the generator-rendered arithmetic bit-for-bit
    * against the oracle BEFORE any layout builds on it (the q31/q79
    * lockstep-expression discipline: curve bugs must fail here, not as
    * a mysterious skipping regression in q137). Pure projection over one
    * broadcast bounds row — scales as a map stage. */
  private val q136ZorderCurve = QueryDef(
    (s, dir) =>
      curveFrame(s, dir)
        .select("l_orderkey", "l_linenumber", "xb", "yb", "zval")
        .orderBy("l_orderkey", "l_linenumber"),
    s"""WITH $curveCte
       |SELECT l_orderkey, l_linenumber, xb, yb, zval
       |FROM z ORDER BY l_orderkey, l_linenumber""")

  /** q187 — the N-ARY curve, row by row (q136's lockstep-expression
    * discipline at THREE dimensions): 8-bit quantization of
    * (l_partkey, l_suppkey, l_linenumber) and the round-robin 24-bit
    * interleave for every lineitem row, generator-rendered so both
    * engines evaluate the identical arithmetic. Pins the n-column
    * generalization ([[withZValN]], `graft.layout.zorder=a,b,c`)
    * bit-for-bit BEFORE any layout builds on it; the narrow third
    * dimension (l_linenumber spans 1..7) also pins the multiply-first
    * normalization at its degenerate end — un-normalized it would
    * occupy only the low bits and the curve would silently collapse
    * to the 2-d case. Pure projection over one broadcast bounds row —
    * a map stage at any scale. */
  private val q187Zorder3Curve = QueryDef(
    (s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val bounds = li.agg(
        min("l_partkey").as("mnx"), max("l_partkey").as("mxx"),
        min("l_suppkey").as("mny"), max("l_suppkey").as("mxy"),
        min("l_linenumber").as("mnw"), max("l_linenumber").as("mxw"))
      li.crossJoin(broadcast(bounds))
        .withColumn("xb", expr(sparkBucket("l_partkey", "mnx", "mxx")))
        .withColumn("yb", expr(sparkBucket("l_suppkey", "mny", "mxy")))
        .withColumn("wb", expr(sparkBucket("l_linenumber", "mnw", "mxw")))
        .withColumn("zval", expr(zSqlN(Seq("xb", "yb", "wb"))))
        .select("l_orderkey", "l_linenumber", "xb", "yb", "wb", "zval")
        .orderBy("l_orderkey", "l_linenumber")
    },
    s"""WITH b AS (SELECT min(l_partkey) AS mnx, max(l_partkey) AS mxx,
       |                  min(l_suppkey) AS mny, max(l_suppkey) AS mxy,
       |                  min(l_linenumber) AS mnw,
       |                  max(l_linenumber) AS mxw
       |           FROM lineitem),
       |g AS (SELECT l_orderkey, l_linenumber,
       |             ${duckBucket("l_partkey", "mnx", "mxx")} AS xb,
       |             ${duckBucket("l_suppkey", "mny", "mxy")} AS yb,
       |             ${duckBucket("l_linenumber", "mnw", "mxw")} AS wb
       |      FROM lineitem, b)
       |SELECT l_orderkey, l_linenumber, xb, yb, wb,
       |       ${zSqlN(Seq("xb", "yb", "wb"))} AS zval
       |FROM g ORDER BY l_orderkey, l_linenumber""")

  /** q137 — the skipping ACCEPTANCE INSTRUMENT at BOTH granularities:
    * one row pricing what a min/max-stats reader opens under three
    * predicates (x-only range, y-only range, x AND y box — each
    * spanning 1/16 of its dimension, centered) against two 64-file
    * layouts of the same rows: LINEAR (sorted by l_partkey) and
    * Z-ORDER (sorted by zval) — counted in FILES (manifest-level
    * pruning) and in ROW GROUPS ($RG_PER_FILE contiguous rank
    * sub-blocks per file — the granularity a parquet reader actually
    * skips at, so the rg_* columns are the numbers a 100 TB scan
    * pays). Assignment is contiguous rank blocks over a deterministic
    * total order (ties broken by primary key) — the semantics of
    * `repartitionByRange` + within-partition sort (and of parquet's
    * in-order row-group flushes), restated as window arithmetic so
    * DuckDB verifies every count; LayoutSpec runs the physical twin
    * including block-level footer stats. Expected physics, now pinned:
    * linear reads ~1/16 of units for x but ALL units for y; z-order
    * reads a few units for the box and O(sqrt) for either single
    * dimension — and row-group counts sharpen every ratio (4× the
    * units at the same clustering).
    *
    * rows_box (the box's true selectivity) rides along so the unit
    * counts can be read as amplification: units opened per row matched.
    */
  private val q137ZorderSkipping = QueryDef(
    (s, dir) => {
      val cf = curveFrame(s, dir).localCheckpoint(true)
      val n = cf.count()
      val nRg = FILES * RG_PER_FILE
      val fids = cf.select(col("l_partkey"), col("l_suppkey"),
        col("mnx"), col("mxx"), col("mny"), col("mxy"),
        expr(s"CAST(((row_number() OVER (ORDER BY l_partkey, l_orderkey," +
          s" l_linenumber)) - 1) * $FILES DIV $n AS BIGINT)").as("fid_lin"),
        expr(s"CAST(((row_number() OVER (ORDER BY zval, l_orderkey," +
          s" l_linenumber)) - 1) * $FILES DIV $n AS BIGINT)").as("fid_z"),
        expr(s"CAST(((row_number() OVER (ORDER BY l_partkey, l_orderkey," +
          s" l_linenumber)) - 1) * $nRg DIV $n AS BIGINT)").as("rgid_lin"),
        expr(s"CAST(((row_number() OVER (ORDER BY zval, l_orderkey," +
          s" l_linenumber)) - 1) * $nRg DIV $n AS BIGINT)").as("rgid_z"))
      def boxed(c: DataFrame): DataFrame = c
        .withColumn("x1", expr("mnx + ((mxx - mnx) * 7) DIV 16"))
        .withColumn("x2", expr("mnx + ((mxx - mnx) * 8) DIV 16"))
        .withColumn("y1", expr("mny + ((mxy - mny) * 7) DIV 16"))
        .withColumn("y2", expr("mny + ((mxy - mny) * 8) DIV 16"))
      // `unit` = files or modeled row groups: the same min/max pruning
      // arithmetic at both granularities; `emitCount` keeps the file
      // totals in the row without duplicating them for row groups
      def reads(c: DataFrame, unit: String, px: String,
          tag: String, emitCount: Boolean): DataFrame = {
        val base = boxed(c.groupBy(col(unit).as("u"), col("mnx"),
            col("mxx"), col("mny"), col("mxy"))
          .agg(min("l_partkey").as("fminx"), max("l_partkey").as("fmaxx"),
            min("l_suppkey").as("fminy"), max("l_suppkey").as("fmaxy")))
        val aggs = Seq(
          sum(when(col("fminx") <= col("x2") && col("fmaxx") >= col("x1"),
            1L).otherwise(0L)).as(s"${px}_x_$tag"),
          sum(when(col("fminy") <= col("y2") && col("fmaxy") >= col("y1"),
            1L).otherwise(0L)).as(s"${px}_y_$tag"),
          sum(when(col("fminx") <= col("x2") && col("fmaxx") >= col("x1")
            && col("fminy") <= col("y2") && col("fmaxy") >= col("y1"),
            1L).otherwise(0L)).as(s"${px}_box_$tag"))
        if (emitCount)
          base.agg(count(lit(1)).as(s"files_$tag"), aggs: _*)
        else base.agg(aggs.head, aggs.tail: _*)
      }
      val rowsBox = boxed(fids)
        .agg(sum(when(col("l_partkey").between(col("x1"), col("x2")) &&
          col("l_suppkey").between(col("y1"), col("y2")), 1L)
          .otherwise(0L)).as("rows_box"))
      reads(fids, "fid_lin", "read", "linear", emitCount = true)
        .crossJoin(reads(fids, "fid_z", "read", "zorder", emitCount = true))
        .crossJoin(reads(fids, "rgid_lin", "rg", "linear", emitCount = false))
        .crossJoin(reads(fids, "rgid_z", "rg", "zorder", emitCount = false))
        .crossJoin(rowsBox)
        .select("files_linear", "read_x_linear", "read_y_linear",
          "read_box_linear", "files_zorder", "read_x_zorder",
          "read_y_zorder", "read_box_zorder",
          "rg_x_linear", "rg_y_linear", "rg_box_linear",
          "rg_x_zorder", "rg_y_zorder", "rg_box_zorder", "rows_box")
    },
    s"""WITH $curveCte,
       |n AS (SELECT count(*) AS n FROM z),
       |f AS (SELECT l_partkey, l_suppkey, mnx, mxx, mny, mxy,
       |        CAST(((row_number() OVER (ORDER BY l_partkey, l_orderkey,
       |          l_linenumber)) - 1) * $FILES // n AS BIGINT) AS fid_lin,
       |        CAST(((row_number() OVER (ORDER BY zval, l_orderkey,
       |          l_linenumber)) - 1) * $FILES // n AS BIGINT) AS fid_z,
       |        CAST(((row_number() OVER (ORDER BY l_partkey, l_orderkey,
       |          l_linenumber)) - 1) * ${FILES * RG_PER_FILE} // n
       |          AS BIGINT) AS rgid_lin,
       |        CAST(((row_number() OVER (ORDER BY zval, l_orderkey,
       |          l_linenumber)) - 1) * ${FILES * RG_PER_FILE} // n
       |          AS BIGINT) AS rgid_z
       |      FROM z, b, n),
       |p AS (SELECT mnx + ((mxx - mnx) * 7) // 16 AS x1,
       |             mnx + ((mxx - mnx) * 8) // 16 AS x2,
       |             mny + ((mxy - mny) * 7) // 16 AS y1,
       |             mny + ((mxy - mny) * 8) // 16 AS y2 FROM b),
       |sl AS (SELECT fid_lin, min(l_partkey) AS fminx,
       |              max(l_partkey) AS fmaxx, min(l_suppkey) AS fminy,
       |              max(l_suppkey) AS fmaxy FROM f GROUP BY fid_lin),
       |sz AS (SELECT fid_z, min(l_partkey) AS fminx,
       |              max(l_partkey) AS fmaxx, min(l_suppkey) AS fminy,
       |              max(l_suppkey) AS fmaxy FROM f GROUP BY fid_z),
       |rl AS (SELECT rgid_lin, min(l_partkey) AS fminx,
       |              max(l_partkey) AS fmaxx, min(l_suppkey) AS fminy,
       |              max(l_suppkey) AS fmaxy FROM f GROUP BY rgid_lin),
       |rz AS (SELECT rgid_z, min(l_partkey) AS fminx,
       |              max(l_partkey) AS fmaxx, min(l_suppkey) AS fminy,
       |              max(l_suppkey) AS fmaxy FROM f GROUP BY rgid_z),
       |al AS (SELECT CAST(count(*) AS BIGINT) AS files_linear,
       |         CAST(sum(CASE WHEN fminx <= x2 AND fmaxx >= x1
       |           THEN 1 ELSE 0 END) AS BIGINT) AS read_x_linear,
       |         CAST(sum(CASE WHEN fminy <= y2 AND fmaxy >= y1
       |           THEN 1 ELSE 0 END) AS BIGINT) AS read_y_linear,
       |         CAST(sum(CASE WHEN fminx <= x2 AND fmaxx >= x1
       |           AND fminy <= y2 AND fmaxy >= y1
       |           THEN 1 ELSE 0 END) AS BIGINT) AS read_box_linear
       |       FROM sl, p),
       |az AS (SELECT CAST(count(*) AS BIGINT) AS files_zorder,
       |         CAST(sum(CASE WHEN fminx <= x2 AND fmaxx >= x1
       |           THEN 1 ELSE 0 END) AS BIGINT) AS read_x_zorder,
       |         CAST(sum(CASE WHEN fminy <= y2 AND fmaxy >= y1
       |           THEN 1 ELSE 0 END) AS BIGINT) AS read_y_zorder,
       |         CAST(sum(CASE WHEN fminx <= x2 AND fmaxx >= x1
       |           AND fminy <= y2 AND fmaxy >= y1
       |           THEN 1 ELSE 0 END) AS BIGINT) AS read_box_zorder
       |       FROM sz, p),
       |arl AS (SELECT
       |         CAST(sum(CASE WHEN fminx <= x2 AND fmaxx >= x1
       |           THEN 1 ELSE 0 END) AS BIGINT) AS rg_x_linear,
       |         CAST(sum(CASE WHEN fminy <= y2 AND fmaxy >= y1
       |           THEN 1 ELSE 0 END) AS BIGINT) AS rg_y_linear,
       |         CAST(sum(CASE WHEN fminx <= x2 AND fmaxx >= x1
       |           AND fminy <= y2 AND fmaxy >= y1
       |           THEN 1 ELSE 0 END) AS BIGINT) AS rg_box_linear
       |       FROM rl, p),
       |arz AS (SELECT
       |         CAST(sum(CASE WHEN fminx <= x2 AND fmaxx >= x1
       |           THEN 1 ELSE 0 END) AS BIGINT) AS rg_x_zorder,
       |         CAST(sum(CASE WHEN fminy <= y2 AND fmaxy >= y1
       |           THEN 1 ELSE 0 END) AS BIGINT) AS rg_y_zorder,
       |         CAST(sum(CASE WHEN fminx <= x2 AND fmaxx >= x1
       |           AND fminy <= y2 AND fmaxy >= y1
       |           THEN 1 ELSE 0 END) AS BIGINT) AS rg_box_zorder
       |       FROM rz, p),
       |rb AS (SELECT CAST(sum(CASE WHEN l_partkey BETWEEN x1 AND x2
       |           AND l_suppkey BETWEEN y1 AND y2 THEN 1 ELSE 0 END)
       |         AS BIGINT) AS rows_box FROM f, p)
       |SELECT files_linear, read_x_linear, read_y_linear, read_box_linear,
       |       files_zorder, read_x_zorder, read_y_zorder, read_box_zorder,
       |       rg_x_linear, rg_y_linear, rg_box_linear,
       |       rg_x_zorder, rg_y_zorder, rg_box_zorder, rows_box
       |FROM al, az, arl, arz, rb""")

  /** The PRODUCTION layout write: attach the z-value of (`xCol`, `yCol`)
    * with data-derived bounds, range-exchange into `files` partitions on
    * the curve key, sort within each, write parquet. One shuffle (range
    * exchange with sampled bounds — never a global single-partition
    * sort), one sorted write; the 100 TB OPTIMIZE-job cost profile. */
  def zOrderWrite(df: DataFrame, xCol: String, yCol: String,
      outDir: String, files: Int = FILES,
      blockBytes: Option[Long] = None): Unit = {
    val w = withZVal(df, xCol, yCol)
      .repartitionByRange(files, col("zval"))
      .sortWithinPartitions("zval")
      .drop("zval")
      .write.mode("overwrite")
    blockBytes.foreach(b => w.option("parquet.block.size", b.toString))
    w.parquet(outDir)
  }

  /** Reader-side stats index over a written layout: per-file min/max of
    * the two predicate columns, from the files themselves (`_metadata`
    * file path + one aggregation — at warehouse scale this relation IS
    * the manifest/footers, maintained by the writer for free). */
  def fileStats(spark: SparkSession, dir: String, xCol: String,
      yCol: String): DataFrame =
    spark.read.parquet(dir)
      .select(col("_metadata.file_path").as("file"),
        col(xCol).as("x"), col(yCol).as("y"))
      .groupBy("file")
      .agg(min("x").as("fminx"), max("x").as("fmaxx"),
        min("y").as("fminy"), max("y").as("fmaxy"))

  /** The same per-file stats read from the PARQUET FOOTERS alone — no
    * data pages touched. This is the production reader path: at 100 TB
    * the stats relation comes from metadata (footers, or the manifest a
    * writer maintains from them), never from rescanning rows; the loop
    * below is driver-side ON PURPOSE because it is manifest-sized
    * (O(files) footer reads of a few KB — the same name-walk cost class
    * as the q123 compaction pricer), not data-sized. LayoutSpec asserts
    * it agrees exactly with the data-derived [[fileStats]]. */
  def footerStats(spark: SparkSession, dir: String, xCol: String,
      yCol: String): DataFrame =
    footerBlockStats(spark, listParquet(spark, dir), xCol, yCol)
      .groupBy("file")
      .agg(min("fminx").as("fminx"), max("fmaxx").as("fmaxx"),
        min("fminy").as("fminy"), max("fmaxy").as("fmaxy"))

  private def listParquet(spark: SparkSession, dir: String): Seq[String] = {
    import org.apache.hadoop.fs.Path
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    fs.listStatus(root).toSeq.map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).map(_.toString)
  }

  /** Per-ROW-GROUP min/max stats for `files`, straight from the parquet
    * footers — the granularity a reader ACTUALLY pays at: parquet scans
    * skip at the row-group level, so "files opened" under-reports the
    * win whenever a file holds several groups (every file does at
    * 100 TB). One row per (file, row group); same manifest-sized
    * driver-loop cost class as [[footerStats]] (footers only, no data
    * pages). [[prunedRowGroups]] applies the reader arithmetic;
    * LayoutSpec asserts these stats against the physically-written
    * blocks, and q151 gates box-predicate row-group skipping on a
    * z-ordered [[MergeTable.optimizeZOrder]] table. */
  def footerBlockStats(spark: SparkSession, files: Seq[String],
      xCol: String, yCol: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import scala.jdk.CollectionConverters._
    val conf = spark.sessionState.newHadoopConf()
    val rows = files.flatMap { file =>
      val rdr = ParquetFileReader.open(
        HadoopInputFile.fromPath(new Path(file), conf))
      try rdr.getFooter.getBlocks.asScala.toSeq.zipWithIndex.map {
        case (b, i) =>
          def bound(c: String): (Long, Long) = {
            val st = b.getColumns.asScala
              .find(_.getPath.toDotString == c)
              .getOrElse(sys.error(s"no footer stats for $c"))
              .getStatistics
            (st.genericGetMin.asInstanceOf[Number].longValue,
              st.genericGetMax.asInstanceOf[Number].longValue)
          }
          val (mnx, mxx) = bound(xCol)
          val (mny, mxy) = bound(yCol)
          (file, i, b.getRowCount, mnx, mxx, mny, mxy)
      } finally rdr.close()
    }
    spark.createDataFrame(rows)
      .toDF("file", "block", "n_rows", "fminx", "fmaxx", "fminy", "fmaxy")
  }

  /** Row groups a min/max-stats reader must OPEN for a conjunctive
    * range predicate — [[prunedFiles]]'s arithmetic at the granularity
    * parquet actually skips at. */
  def prunedRowGroups(stats: DataFrame, xRange: Option[(Long, Long)],
      yRange: Option[(Long, Long)]): DataFrame = {
    val xOk = xRange.map { case (lo, hi) =>
      col("fminx") <= hi && col("fmaxx") >= lo }.getOrElse(lit(true))
    val yOk = yRange.map { case (lo, hi) =>
      col("fminy") <= hi && col("fmaxy") >= lo }.getOrElse(lit(true))
    stats.filter(xOk && yOk)
  }

  /** Files a min/max-stats reader must open for a conjunctive range
    * predicate (None = dimension unconstrained) — the manifest-pruning
    * arithmetic made explicit. */
  def prunedFiles(stats: DataFrame, xRange: Option[(Long, Long)],
      yRange: Option[(Long, Long)]): DataFrame = {
    val xOk = xRange.map { case (lo, hi) =>
      col("fminx") <= hi && col("fmaxx") >= lo }.getOrElse(lit(true))
    val yOk = yRange.map { case (lo, hi) =>
      col("fminy") <= hi && col("fmaxy") >= lo }.getOrElse(lit(true))
    stats.filter(xOk && yOk).select("file")
  }

  val defs: Map[String, QueryDef] = Map(
    "q136_zorder_curve" -> q136ZorderCurve,
    "q137_zorder_skipping" -> q137ZorderSkipping,
    "q187_zorder3_curve" -> q187Zorder3Curve,
  )
}
