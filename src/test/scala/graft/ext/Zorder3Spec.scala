package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** N-column z-order: the round-robin interleave's k=2 instance is
  * value-identical to the binary curve, a 3-column layout declares
  * itself as `graft.layout.zorder=a,b,c`, and compactDvs reconstructs
  * the same 3-d curve for folded buckets. */
class Zorder3Spec extends SparkSpec {

  test("withZValN at k=2 computes byte-identical z-values to the " +
      "binary withZVal — the n-ary curve is a strict generalization") {
    import spark.implicits._
    val df = (1 to 2000).map(i =>
      (i.toLong, (i * 37L) % 1000L, (i * 101L) % 1000L))
      .toDF("id", "x", "y")
    val a = Layout.withZVal(df, "x", "y")
      .select("id", "zval").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Layout.withZValN(df, Seq("x", "y"))
      .select("id", "zval").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
  }

  test("withZValN refusals: arity, duplicates, non-integral columns") {
    import spark.implicits._
    val df = Seq((1L, 2L, "s")).toDF("x", "y", "t")
    def refuses(body: => Any, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](body)
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    refuses(Layout.withZValN(df, Seq("x")), "2..7")
    refuses(Layout.withZValN(df, Seq("x", "x")), "duplicate")
    refuses(Layout.withZValN(df, Seq("x", "t")), "integral")
  }

  test("optimizeZOrderN at 3 columns: contents-invariant, declares " +
      "graft.layout.zorder=x,y,w, and compactDvs RECONSTRUCTS the " +
      "3-d curve for a folded bucket (zval-sorted file, attestation " +
      "green)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-z3")
      .resolve("t").toString
    val n = 4000
    val df = (1 to n).map(i => (i.toLong, (i * 37L) % 1000L,
      (i * 101L) % 1000L, (i * 7L) % 50L)).toDF("key", "x", "y", "w")
    MergeTable.create(df, dir, "key", hexDigits = 1)
    val before = MergeTable.readTable(spark, dir).drop("bucket")
      .orderBy("key").collect().toSeq
    val st = MergeTable.optimizeZOrderN(spark, dir, Seq("x", "y", "w"))
    assert(st.version === 2L)
    val t = MergeTable.readTable(spark, dir)
    assert(t.drop("bucket").orderBy("key").collect().toSeq === before)
    assert(!t.columns.contains("zval"))
    assert(MergeTable.properties(spark, dir)
      .get("graft.layout.zorder").contains("x,y,w"))
    // dirty exactly ONE bucket through the MOR path, then fold it
    val kb = t.select("key", "bucket").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val kA = kb.keys.min
    MergeTable.deleteKeysMor(spark, dir, Seq(kA).toDF("key")): Unit
    val cs = MergeTable.compactDvs(spark, dir)
    assert(cs.bucketsCompacted === 1L && cs.tombstonesPurged === 1L)
    assert(MergeTable.fsckDeep(spark, dir).mismatched.isEmpty)
    val after = MergeTable.readTable(spark, dir)
    assert(after.count() === (n - 1).toLong)
    // the folded bucket's file is sorted by the SAME 3-d curve the
    // declaration names: recompute zval over exactly the folded rows
    // (their own bounds — the fold's derivation) and check the file's
    // physical row order is monotone in it
    val foldedRel = MergeTable.readManifest(spark, dir,
        MergeTable.versions(spark, dir).last)
      .filter(e => e.contains(s"bucket=${kb(kA)}/") &&
        e.startsWith(s"v=${cs.version}-"))
    assert(foldedRel.size === 1, s"expected one folded file: $foldedRel")
    val file = spark.read.parquet(s"$dir/data/${foldedRel.head}")
      .withColumn("__pos", col("_metadata.row_index"))
    val zd = Layout.withZValN(file, Seq("x", "y", "w"))
      .select("__pos", "zval").orderBy("__pos").collect()
    val zs = zd.map(_.getLong(1)).toSeq
    assert(zs === zs.sorted,
      "the folded bucket must come back zval-sorted under the " +
        "declared 3-column curve")
  }
}
