package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** MergeTable.merge — the conditional three-way MERGE: clause-order
  * dispatch over matched / not-matched / not-matched-by-source rows,
  * one atomic snapshot commit, upsert-shaped bucket pruning when no
  * by-source clause forces a full-table pass, and loud validation of
  * every ill-formed clause set. */
class MergeClauseSpec extends SparkSpec {
  import MergeTable.{MergeAction, MergeWhen}
  import MergeAction.{Delete, Update, UpdateAll}

  private def mkTable(n: Int = 40): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-merge")
      .resolve("t").toString
    val df = (1 to n).map(i => (i.toLong, i * 10L, s"v$i"))
      .toDF("key", "cents", "value")
    MergeTable.create(df, dir, "key")
    dir
  }

  private def state(dir: String): Map[Long, (Long, String)] =
    MergeTable.readTable(spark, dir)
      .select("key", "cents", "value").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap

  test("all three clause classes dispatch in order in ONE commit: " +
      "conditional update, fall-through delete, conditional insert, " +
      "by-source aging and reaping — final state and stats exact") {
    import spark.implicits._
    val dir = mkTable(10) // keys 1..10, cents k*10
    // source: keys 2,4,6 (matched) with varying cents; 100,101 (new)
    val src = Seq((2L, 25L, "s2"), (4L, 35L, "s4"), (6L, 65L, "s6"),
      (100L, 7L, "s100"), (101L, 8L, "s101"))
      .toDF("key", "cents", "value")
    val st = MergeTable.merge(spark, dir, src,
      matched = Seq(
        // fires where the source is strictly larger: 2 (25>20), 6
        // (65>60); 4 (35<40) falls through
        MergeWhen(Some(col("src.cents") > col("tgt.cents")),
          Update(Map("cents" -> col("src.cents"),
            "value" -> lit("up")))),
        // the falling-through matched row (4) dies
        MergeWhen(None, Delete)),
      notMatched = Seq(
        // odd cents only: 7 inserts, 8 is skipped (ignored, not deleted)
        MergeWhen(Some(col("src.cents") % 2 === 1), UpdateAll)),
      notMatchedBySource = Seq(
        // by-source rows are 1,3,5,7,8,9,10; %3==0 ages (3, 9),
        MergeWhen(Some(col("tgt.key") % 3 === 0),
          Update(Map("cents" -> (col("tgt.cents") + 1)))),
        // then %5==0 of the remainder is reaped (5, 10)
        MergeWhen(Some(col("tgt.key") % 5 === 0), Delete)))
    assert(st.version === 2L)
    assert((st.rowsUpdated, st.rowsDeleted, st.rowsInserted,
      st.rowsCarried) === (4L, 3L, 1L, 3L),
      s"updated {2,6} + aged {3,9}; deleted {4} + reaped {5,10}; " +
        s"inserted 100; carried {1,7,8} — got $st")
    assert(state(dir) === Map(
      1L -> (10L, "v1"), 2L -> (25L, "up"), 3L -> (31L, "v3"),
      6L -> (65L, "up"), 7L -> (70L, "v7"), 8L -> (80L, "v8"),
      9L -> (91L, "v9"), 100L -> (7L, "s100")))
    // snapshot isolation: v1 is untouched history
    assert(MergeTable.readTable(spark, dir, Some(1L)).count() === 10L)
  }

  test("no by-source clause => upsert-shaped pruning: only the " +
      "source's hash buckets are read and rewritten, untouched files " +
      "survive byte-identical, and absent keys match nothing") {
    import spark.implicits._
    val dir = mkTable(400)
    val before = MergeTable.readTable(spark, dir).select("bucket")
      .distinct().count()
    val src = Seq((7L, 0L, "seven"), (9000L, 1L, "new"))
      .toDF("key", "cents", "value")
    val st = MergeTable.merge(spark, dir, src,
      matched = Seq(MergeWhen(None, UpdateAll)),
      notMatched = Seq(MergeWhen(None, UpdateAll)))
    val srcBuckets = src
      .select(substring(md5(col("key").cast("string")), 1, 2))
      .distinct().count()
    assert(st.bucketsRewritten === srcBuckets,
      s"merge must stay O(source buckets): $st vs $srcBuckets of $before")
    assert(st.filesRead <= srcBuckets && st.filesWritten <= srcBuckets)
    assert(state(dir).get(7L) === Some((0L, "seven")))
    assert(state(dir).get(9000L) === Some((1L, "new")))
    assert(state(dir).size === 401)
  }

  test("a by-source clause prices a full-table pass and says so in " +
      "the stats; matched+insert via UpdateAll equals upsert") {
    import spark.implicits._
    val dir = mkTable(50)
    val allBuckets = MergeTable.readTable(spark, dir).select("bucket")
      .distinct().count()
    val src = Seq((1L, 999L, "one")).toDF("key", "cents", "value")
    val st = MergeTable.merge(spark, dir, src,
      matched = Seq(MergeWhen(None, UpdateAll)),
      notMatchedBySource = Seq(
        MergeWhen(Some(col("tgt.key") > 48L), Delete)))
    assert(st.bucketsRewritten === allBuckets,
      "a by-source clause must see (and so rewrite) every bucket")
    assert(st.rowsDeleted === 2L && st.rowsUpdated === 1L)
    assert(state(dir).size === 48)
    // upsert-equivalence of the classic clause pair
    val dir2 = mkTable(50)
    val batch = Seq((3L, 0L, "three"), (300L, 1L, "new"))
      .toDF("key", "cents", "value")
    MergeTable.merge(spark, dir2, batch,
      matched = Seq(MergeWhen(None, UpdateAll)),
      notMatched = Seq(MergeWhen(None, UpdateAll)))
    val dir3 = mkTable(50)
    MergeTable.upsert(spark, dir3, batch)
    assert(state(dir2) === state(dir3))
  }

  test("an Update set may EXTEND the schema: untouched rows read null " +
      "for the new column, and the extension shows up on later reads") {
    import spark.implicits._
    val dir = mkTable(10)
    val src = Seq((4L, 0L, "x")).toDF("key", "cents", "value")
    MergeTable.merge(spark, dir, src,
      matched = Seq(MergeWhen(None,
        Update(Map("note" -> lit("touched"))))))
    val rows = MergeTable.readTable(spark, dir)
      .select("key", "cents", "value", "note").collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getString(2), Option(r.getString(3)))).toMap
    // set default is the TARGET value for matched clauses: cents/value
    // keep v4's originals, only note changes
    assert(rows(4L) === ((40L, "v4", Some("touched"))))
    assert(rows(5L) === ((50L, "v5", None)))
    assert(rows.size === 10)
  }

  test("ill-formed merges fail loudly: empty clause set, delete on " +
      "not-matched, UpdateAll by source, setting the key, a dup-key " +
      "source, and an UpdateAll source missing table columns") {
    import spark.implicits._
    val dir = mkTable(5)
    val src = Seq((1L, 0L, "x")).toDF("key", "cents", "value")
    def msg(f: => Any): String =
      intercept[IllegalArgumentException](f).getMessage
    assert(msg(MergeTable.merge(spark, dir, src))
      .contains("at least one WHEN clause"))
    assert(msg(MergeTable.merge(spark, dir, src,
      notMatched = Seq(MergeWhen(None, Delete))))
      .contains("NOT MATCHED cannot delete"))
    assert(msg(MergeTable.merge(spark, dir, src,
      notMatchedBySource = Seq(MergeWhen(None, UpdateAll))))
      .contains("cannot take the source row"))
    assert(msg(MergeTable.merge(spark, dir, src,
      matched = Seq(MergeWhen(None, Update(Map("key" -> lit(9L)))))))
      .contains("may not set the key"))
    assert(msg(MergeTable.merge(spark, dir,
      Seq((1L, 0L, "a"), (1L, 1L, "b")).toDF("key", "cents", "value"),
      matched = Seq(MergeWhen(None, UpdateAll))))
      .contains("at most one row per key"))
    assert(msg(MergeTable.merge(spark, dir,
      Seq((1L, 0L)).toDF("key", "cents"),
      matched = Seq(MergeWhen(None, UpdateAll))))
      .contains("missing table columns"))
    // a conditions-only merge that names no row leaves the table as-is
    val before = state(dir)
    val st = MergeTable.merge(spark, dir,
      Seq((999L, 0L, "z")).toDF("key", "cents", "value"),
      matched = Seq(MergeWhen(None, Delete)))
    assert(st.rowsDeleted === 0L && state(dir) === before)
  }
}
