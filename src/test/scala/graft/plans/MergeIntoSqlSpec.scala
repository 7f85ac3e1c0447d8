package graft.plans

import graft.SparkSpec
import graft.ext.MergeTable
import org.apache.spark.sql.functions._

/** MERGE INTO merge_table.`/dir` — the SQL DML route into the clause
  * engine: parsed by Spark's own grammar, intercepted while the
  * target is the unresolved path identifier, executed as one
  * MergeTable.merge. Same engine, same snapshot commit, loud on
  * every unsupported shape. */
class MergeIntoSqlSpec extends SparkSpec {

  private def mkTable(n: Int = 300): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-midml")
      .resolve("t").toString
    MergeTable.create(
      (1 to n).map(i => (i.toLong, i.toLong * 10, s"s$i"))
        .toDF("key", "cents", "status"),
      dir, "key")
    dir
  }

  test("a four-clause MERGE INTO statement lands as ONE snapshot " +
      "commit with SQL clause-order semantics, and the stats row " +
      "comes back through spark.sql") {
    import spark.implicits._
    val dir = mkTable()
    Seq((2L, 100L, "up"), (3L, 5L, "down"), (301L, 77L, "new"),
      (302L, 9L, "skip"))
      .toDF("key", "cents", "status")
      .createOrReplaceTempView("mi_src")
    val st = spark.sql(
      s"""MERGE INTO merge_table.`$dir` AS t
         |USING mi_src AS s
         |ON t.key = s.key
         |WHEN MATCHED AND s.cents > t.cents THEN
         |  UPDATE SET cents = s.cents, status = s.status
         |WHEN MATCHED THEN DELETE
         |WHEN NOT MATCHED AND s.cents % 2 = 1 THEN INSERT *
         |WHEN NOT MATCHED BY SOURCE AND t.key = 7 THEN
         |  UPDATE SET cents = t.cents + 1
         |""".stripMargin).collect().head
    // key 2: src 100 > tgt 20 -> updated; key 3: 5 < 30 -> clause 2
    // deletes; 301 (77 odd) inserts; 302 (9 odd)... 9 % 2 = 1 -> also
    // inserts; key 7 untouched by source -> aged by the by-source
    // clause; everything else carries
    assert(st.getLong(1) === 2L, s"rows_updated: $st") // key 2 + key 7
    assert(st.getLong(2) === 1L, s"rows_deleted: $st") // key 3
    assert(st.getLong(3) === 2L, s"rows_inserted: $st") // 301, 302
    val t = MergeTable.readTable(spark, dir)
    assert(t.count() === 301L) // 300 - 1 deleted + 2 inserted
    val got = t.filter(col("key").isin(2L, 3L, 7L, 301L, 302L))
      .select("key", "cents", "status").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(got(2L) === ((100L, "up")))
    assert(!got.contains(3L))
    assert(got(7L) === ((71L, "s7")))
    assert(got(301L) === ((77L, "new")))
    assert(got(302L) === ((9L, "skip")))
  }

  test("an explicit INSERT column list follows SQL semantics: " +
      "unassigned table columns land NULL, and assigning the key " +
      "from anything but the source key is rejected") {
    import spark.implicits._
    val dir = mkTable(50)
    Seq((501L, 42L)).toDF("key", "cents")
      .createOrReplaceTempView("mi_src2")
    spark.sql(
      s"""MERGE INTO merge_table.`$dir` AS t
         |USING mi_src2 AS s
         |ON t.key = s.key
         |WHEN NOT MATCHED THEN INSERT (key, cents) VALUES (s.key, s.cents)
         |""".stripMargin).collect()
    val r = MergeTable.readTable(spark, dir)
      .filter(col("key") === 501L)
      .select("cents", "status").collect().head
    assert(r.getLong(0) === 42L)
    assert(r.isNullAt(1), "unassigned status must insert as NULL")
    val err = intercept[IllegalArgumentException] {
      spark.sql(
        s"""MERGE INTO merge_table.`$dir` AS t
           |USING mi_src2 AS s
           |ON t.key = s.key
           |WHEN NOT MATCHED THEN INSERT (key, cents) VALUES (-s.key, s.cents)
           |""".stripMargin).collect()
    }
    assert(err.getMessage.contains("INSERT must assign key"),
      s"re-keying insert must be rejected: $err")
  }

  test("a non-key ON condition and an ambiguous bare reference both " +
      "fail loudly; a MERGE against a non-merge_table identifier is " +
      "left to Spark's own resolution") {
    import spark.implicits._
    val dir = mkTable(20)
    Seq((1L, 5L, "x")).toDF("key", "cents", "status")
      .createOrReplaceTempView("mi_src3")
    val e1 = intercept[IllegalArgumentException] {
      spark.sql(
        s"""MERGE INTO merge_table.`$dir` AS t USING mi_src3 AS s
           |ON t.cents = s.cents
           |WHEN MATCHED THEN DELETE""".stripMargin).collect()
    }
    assert(e1.getMessage.contains("key equality"))
    val e2 = intercept[IllegalArgumentException] {
      spark.sql(
        s"""MERGE INTO merge_table.`$dir` AS t USING mi_src3 AS s
           |ON t.key = s.key
           |WHEN MATCHED THEN UPDATE SET cents = cents + 1""".stripMargin)
        .collect()
    }
    assert(e2.getMessage.contains("ambiguous"))
    // foreign target: our rule must not touch it (Spark reports its
    // own missing-table error, not a graft one)
    val e3 = intercept[Exception] {
      spark.sql(
        """MERGE INTO some_other_table AS t USING mi_src3 AS s
          |ON t.key = s.key
          |WHEN MATCHED THEN DELETE""".stripMargin).collect()
    }
    assert(!e3.getMessage.contains("merge_table"),
      s"foreign MERGE target leaked into the graft route: $e3")
  }

  test("UPDATE and DELETE sugar: sourceless DML lands as a by-source " +
      "merge — conditions over table columns, SET arithmetic, key " +
      "immutability, and stats rows back through spark.sql") {
    val dir = mkTable(100)
    val up = spark.sql(
      s"""UPDATE merge_table.`$dir` AS t
         |SET cents = t.cents + 5, status = 'bumped'
         |WHERE t.key % 10 = 0""".stripMargin).collect().head
    assert(up.getLong(1) === 10L, s"rows_updated: $up")
    val t1 = MergeTable.readTable(spark, dir)
    assert(t1.filter(col("status") === "bumped").count() === 10L)
    assert(t1.filter(col("key") === 10L).select("cents")
      .collect().head.getLong(0) === 105L)
    val del = spark.sql(
      s"DELETE FROM merge_table.`$dir` WHERE key > 90").collect().head
    assert(del.getLong(2) === 10L, s"rows_deleted: $del")
    assert(MergeTable.readTable(spark, dir).count() === 90L)
    // unconditioned UPDATE touches every row; SET key rejected
    val all = spark.sql(
      s"UPDATE merge_table.`$dir` SET cents = cents + 1").collect().head
    assert(all.getLong(1) === 90L)
    val err = intercept[IllegalArgumentException] {
      spark.sql(s"UPDATE merge_table.`$dir` SET key = key + 1").collect()
    }
    assert(err.getMessage.contains("cannot be SET"))
  }

  test("KEY-PREDICATE SQL DML takes the O(impacted buckets) path: " +
      "untouched buckets survive BYTE-IDENTICAL (same files re-listed) " +
      "under keyed DELETE/UPDATE, residual conjuncts apply row-level, " +
      "and a non-key WHERE still pays the honest full pass") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-kdml")
      .resolve("t").toString
    MergeTable.create(
      (1 to 400).map(i => (i.toLong, i.toLong * 10, s"s$i"))
        .toDF("key", "cents", "status"),
      dir, "key", hexDigits = 1)
    def files(): Set[String] =
      MergeTable.readTable(spark, dir).inputFiles.toSet
    def bucketOf(f: String): String =
      "bucket=([0-9a-f]+)".r.findFirstMatchIn(f).get.group(1)
    // keyed DELETE: exactly one bucket rewritten
    val before = files()
    spark.sql(s"DELETE FROM merge_table.`$dir` WHERE key = 7").collect()
    val afterDel = files()
    val survivors = before.intersect(afterDel)
    val touched = (before -- survivors).map(bucketOf)
    assert(touched.size === 1,
      s"keyed DELETE must rewrite ONE bucket, touched: $touched")
    assert((afterDel -- before).map(bucketOf) === touched)
    assert(MergeTable.readTable(spark, dir)
      .filter(col("key") === 7L).count() === 0L)
    // keyed UPDATE with IN list + residual: only the residual-passing
    // row moves; the other key is carried; off-key buckets untouched
    val before2 = files()
    spark.sql(s"UPDATE merge_table.`$dir` SET status = 'hot' " +
      "WHERE key IN (11, 12) AND cents > 115").collect()
    val after2 = files()
    val touched2 = (before2 -- before2.intersect(after2)).map(bucketOf)
    val expect2 = Set(11L, 12L).map(k =>
      KeyToBucketPruning.bucketOf(k.toString, 1))
    assert(touched2.subsetOf(expect2),
      s"keyed UPDATE must only rewrite the keys' buckets: $touched2")
    val got = MergeTable.readTable(spark, dir)
      .filter(col("key").isin(11L, 12L))
      .select("key", "status").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got === Map(11L -> "s11", 12L -> "hot"),
      "residual cents > 115 must gate row-level (11*10=110 carried)")
    // a key = NULL predicate matches nothing (and must not error)
    spark.sql(s"DELETE FROM merge_table.`$dir` WHERE key = NULL")
      .collect()
    assert(MergeTable.readTable(spark, dir).count() === 399L)
    // non-key WHERE: the honest full pass — every bucket rewritten
    val before3 = files()
    spark.sql(s"DELETE FROM merge_table.`$dir` WHERE cents >= 3500")
      .collect()
    assert(before3.intersect(files()).isEmpty,
      "a value predicate must pay the full-table pass")
    assert(MergeTable.readTable(spark, dir).count() ===
      (1 to 400).count(i => i != 7 && i * 10 < 3500).toLong)
  }

  test("the SQL route enforces the same CHECK constraints and lands " +
      "the same manifest annotations as the API route") {
    import spark.implicits._
    val dir = mkTable(40)
    MergeTable.addConstraint(spark, dir, "cents_pos", "cents > 0")
    Seq((5L, -1L, "bad")).toDF("key", "cents", "status")
      .createOrReplaceTempView("mi_src4")
    val err = intercept[IllegalStateException] {
      spark.sql(
        s"""MERGE INTO merge_table.`$dir` AS t USING mi_src4 AS s
           |ON t.key = s.key
           |WHEN MATCHED THEN UPDATE SET cents = s.cents""".stripMargin)
        .collect()
    }
    assert(err.getMessage.contains("cents_pos"))
    assert(MergeTable.versions(spark, dir) === Seq(1L),
      "a constraint-rejected SQL merge must commit nothing")
  }

  test("INSERT INTO merge_table routes through upsert: VALUES and " +
      "SELECT forms, keyed replacement, store-assignment casts, and " +
      "one stats row back") {
    val dir = mkTable(20)
    // VALUES form, positional: one replacement (key 5) + one new key;
    // INT literals cast to the BIGINT columns on assignment
    val st = spark.sql(
      s"""INSERT INTO merge_table.`$dir`
         |VALUES (5, 999, 'repl'), (21, 7, 'new')""".stripMargin)
      .collect()
    assert(st.length === 1)
    assert(st.head.getLong(0) === 2L, "INSERT commits the next version")
    assert(st.head.getLong(3) === 1L, "key 5 is a replacement")
    assert(st.head.getLong(4) === 1L, "key 21 is an insert")
    val t = MergeTable.readTable(spark, dir)
    assert(t.count() === 21L)
    assert(t.filter(col("key") === 5L).select("cents", "status")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((999L, "repl")), "an existing key must be REPLACED")
    // SELECT form with a permuted explicit column list
    spark.sql(s"SELECT 22 AS k, 'x' AS st2, 11 AS c")
      .createOrReplaceTempView("ins_src")
    spark.sql(
      s"""INSERT INTO merge_table.`$dir` (key, status, cents)
         |SELECT k, st2, c FROM ins_src""".stripMargin).collect()
    assert(MergeTable.readTable(spark, dir)
      .filter(col("key") === 22L).select("cents", "status")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((11L, "x")))
  }

  test("INSERT INTO merge_table is loud on every unsupported shape: " +
      "OVERWRITE, PARTITION, arity mismatch, partial column list — " +
      "and a CHECK-violating insert commits nothing") {
    val dir = mkTable(10)
    def bad(sql: String, needle: String): Unit = {
      val e = intercept[Exception] { spark.sql(sql).collect() }
      assert(e.getMessage.contains(needle),
        s"expected '$needle' in: ${e.getMessage}")
    }
    bad(s"INSERT OVERWRITE merge_table.`$dir` VALUES (1, 1, 'a')",
      "INSERT OVERWRITE")
    bad(s"INSERT INTO merge_table.`$dir` VALUES (1, 1)",
      "positional INSERT")
    bad(s"INSERT INTO merge_table.`$dir` (key, cents) VALUES (1, 1)",
      "every table column must be assigned")
    assert(MergeTable.versions(spark, dir) === Seq(1L),
      "rejected inserts must commit nothing")
    MergeTable.addConstraint(spark, dir, "cents_pos", "cents > 0")
    val e = intercept[IllegalStateException] {
      spark.sql(s"INSERT INTO merge_table.`$dir` VALUES (99, -5, 'bad')")
        .collect()
    }
    assert(e.getMessage.contains("cents_pos"))
    assert(MergeTable.versions(spark, dir) === Seq(1L),
      "a constraint-rejected INSERT must commit nothing")
  }
}
