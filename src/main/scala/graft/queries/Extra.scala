package graft.queries

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Encoder, Encoders, Row}
import graft.core.{QueryDef, Skew, Tables}

/** Extended operator coverage (SURVEY.md §2.5 UDF/UDAF/UDTF and
  * remaining relational rows): Scala UDF, typed Aggregator UDAF, pivot,
  * multiset set-ops, positional explode (UDTF shape), map functions,
  * statistical aggregates, exact percentiles, salted skew-safe
  * aggregation, and array predicate HOFs.
  */
object Extra {

  /** Scala UDF surface. UDFs are opaque to Catalyst (no codegen, no
    * pushdown through them) — the engine exposes them for extensibility
    * but every other query in this library deliberately avoids them. */
  private val q41Udf = QueryDef(
    (s, dir) => {
      val slug = udf((brand: String, ptype: String) =>
        s"${brand.toLowerCase}:${ptype.toLowerCase}")
      Tables(s, dir, "part")
        .select(col("p_partkey"), slug(col("p_brand"), col("p_type")).as("slug"))
        .orderBy("p_partkey")
    },
    """SELECT p_partkey, lower(p_brand) || ':' || lower(p_type) AS slug
      |FROM part ORDER BY p_partkey""")

  /** Typed Aggregator UDAF: size-weighted mean price per brand. The
    * buffer is a (sum, weight) pair — partial-aggregatable, so it
    * map-side combines exactly like a builtin. */
  private object WeightedMean
      extends Aggregator[(Double, Int), (Double, Long), Double] {
    def zero: (Double, Long) = (0.0, 0L)
    def reduce(b: (Double, Long), r: (Double, Int)): (Double, Long) =
      (b._1 + r._1 * r._2, b._2 + r._2)
    def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
      (a._1 + b._1, a._2 + b._2)
    def finish(b: (Double, Long)): Double =
      if (b._2 == 0) Double.NaN else b._1 / b._2
    def bufferEncoder: Encoder[(Double, Long)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  private val q42Udaf = QueryDef(
    (s, dir) => {
      val wm = udaf(WeightedMean)
      Tables(s, dir, "part")
        .groupBy("p_brand")
        .agg(round(wm(col("p_retailprice"), col("p_size")), 4)
          .as("weighted_price"))
        .orderBy("p_brand")
    },
    """SELECT p_brand,
      |       round(sum(p_retailprice * p_size) / sum(p_size), 4)
      |         AS weighted_price
      |FROM part GROUP BY p_brand ORDER BY p_brand""")

  /** Pivot: event counts per user spread across one column per type.
    * Explicit value list keeps the plan single-pass (no distinct scan). */
  private val q43Pivot = QueryDef(
    (s, dir) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val p = Tables(s, dir, "events")
        .groupBy("user_id")
        .pivot("event_type", types)
        .count()
      types.foldLeft(p)((d, t) =>
          d.withColumn(t, coalesce(col(t), lit(0L))))
        .orderBy("user_id")
    },
    """SELECT user_id,
      |       CAST(sum(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS click,
      |       CAST(sum(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS error,
      |       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
      |       CAST(sum(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS signup,
      |       CAST(sum(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS view
      |FROM events GROUP BY user_id ORDER BY user_id""")

  /** Multiset (ALL) set operations — bag semantics with duplicates. */
  private val q44MultisetOps = QueryDef(
    (s, dir) => {
      val l = Tables(s, dir, "lineitem")
      val a = l.filter(col("l_returnflag") === "A").select("l_orderkey")
      val r = l.filter(col("l_returnflag") === "R").select("l_orderkey")
      a.exceptAll(r).withColumn("op", lit("except_all"))
        .unionByName(a.intersectAll(r).withColumn("op", lit("intersect_all")))
        .groupBy("op")
        .agg(count("*").as("n_rows"),
          countDistinct("l_orderkey").as("n_keys"))
        .orderBy("op")
    },
    """WITH a AS (SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'A'),
      |     r AS (SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'),
      |     u AS (
      |   SELECT 'except_all' AS op, l_orderkey
      |   FROM (SELECT l_orderkey FROM a EXCEPT ALL SELECT l_orderkey FROM r)
      |   UNION ALL
      |   SELECT 'intersect_all' AS op, l_orderkey
      |   FROM (SELECT l_orderkey FROM a INTERSECT ALL SELECT l_orderkey FROM r))
      |SELECT op, count(*) AS n_rows, count(DISTINCT l_orderkey) AS n_keys
      |FROM u GROUP BY op ORDER BY op""")

  /** Positional explode — the generator/UDTF shape with ordinality. */
  private val q45Posexplode = QueryDef(
    (s, dir) =>
      Tables(s, dir, "documents")
        .filter(col("doc_id") < 50)
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "token")))
        .orderBy("doc_id", "pos"),
    """SELECT doc_id, CAST(i - 1 AS INT) AS pos, l[i] AS token
      |FROM (SELECT doc_id, string_split(text, ' ') AS l
      |      FROM documents WHERE doc_id < 50),
      |     UNNEST(generate_series(1, len(l))) AS t(i)
      |ORDER BY doc_id, pos""")

  /** Map functions: build a per-user histogram map from aggregated
    * entries, then read it back out (keys/size/lookup). Output is
    * exploded back to rows so the oracle compares flat values. */
  private val q46MapFuncs = QueryDef(
    (s, dir) => {
      val counts = Tables(s, dir, "events")
        .groupBy("user_id", "event_type").agg(count("*").as("cnt"))
      counts
        .groupBy("user_id")
        .agg(map_from_entries(array_sort(
          collect_list(struct(col("event_type"), col("cnt"))))).as("hist"))
        .select(col("user_id"),
          size(col("hist")).cast("long").as("n_types"),
          coalesce(element_at(col("hist"), "click"), lit(0L)).as("clicks"),
          explode(map_keys(col("hist"))).as("event_type"))
        .orderBy("user_id", "event_type")
    },
    """WITH counts AS (
      |  SELECT user_id, event_type, count(*) AS cnt
      |  FROM events GROUP BY user_id, event_type)
      |SELECT user_id,
      |       count(*) OVER (PARTITION BY user_id) AS n_types,
      |       CAST(coalesce(max(CASE WHEN event_type = 'click' THEN cnt END)
      |         OVER (PARTITION BY user_id), 0) AS BIGINT) AS clicks,
      |       event_type
      |FROM counts ORDER BY user_id, event_type""")

  /** Statistical aggregates: correlation, population stddev/covariance. */
  private val q47Stats = QueryDef(
    (s, dir) =>
      Tables(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          round(corr("l_quantity", "l_extendedprice"), 6).as("qty_price_corr"),
          round(stddev_pop("l_quantity"), 4).as("qty_stddev"),
          round(covar_pop("l_quantity", "l_discount"), 6).as("qty_disc_covar"),
          count("*").as("n"))
        .orderBy("l_returnflag"),
    """SELECT l_returnflag,
      |       round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
      |       round(stddev_pop(l_quantity), 4) AS qty_stddev,
      |       round(covar_pop(l_quantity, l_discount), 6) AS qty_disc_covar,
      |       count(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")

  /** Exact interpolated percentiles (median / p90). */
  private val q48Percentile = QueryDef(
    (s, dir) =>
      Tables(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          round(expr("percentile(l_quantity, 0.5)"), 4).as("qty_median"),
          round(expr("percentile(l_extendedprice, 0.9)"), 4).as("price_p90"),
          count("*").as("n"))
        .orderBy("l_returnflag"),
    """SELECT l_returnflag,
      |       round(quantile_cont(l_quantity, 0.5), 4) AS qty_median,
      |       round(quantile_cont(l_extendedprice, 0.9), 4) AS price_p90,
      |       count(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")

  /** Skew-safe two-stage salted aggregation (graft.core.Skew): must equal
    * the direct groupBy — the oracle IS the unsalted form, proving the
    * rewrite is semantics-preserving. */
  private val q49SaltedAgg = QueryDef(
    (s, dir) =>
      Skew.saltedSumCount(Tables(s, dir, "lineitem"),
          key = col("l_returnflag"), saltSource = col("l_orderkey"),
          value = col("l_quantity"), salts = 8)
        .select(col("k").as("l_returnflag"),
          round(col("total"), 2).as("sum_qty"), col("cnt"))
        .orderBy("l_returnflag"),
    """SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_qty,
      |       count(*) AS cnt
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")

  /** Salted JOIN (Skew.saltedJoin) — the hot-key join mitigation: probe
    * rows take a per-row salt, the build side replicates `salts` ways,
    * and the shuffle keys become (key, salt), spreading a hot orderkey
    * over 8 reducers. The oracle is the PLAIN join + aggregation — the
    * technique's whole contract is plan-only, result-identical. */
  private val q83SaltedJoin = QueryDef(
    (s, dir) =>
      graft.core.Skew.saltedJoin(
          Tables(s, dir, "lineitem")
            .withColumnRenamed("l_orderkey", "o_orderkey"),
          Tables(s, dir, "orders"),
          key = "o_orderkey",
          saltSource = col("l_linenumber"), salts = 8)
        .groupBy("o_orderpriority")
        .agg(round(sum("l_quantity"), 2).as("sum_qty"),
          count(lit(1)).as("n"))
        .orderBy("o_orderpriority"),
    """SELECT o_orderpriority, round(sum(l_quantity), 2) AS sum_qty,
      |       count(*) AS n
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""")

  /** HYBRID hot-key salted join (Skew.hybridSaltedJoin) — q83's
    * refinement: the probe-side key histogram picks the actually-hot
    * keys (orders with > 5 lineitems here, so BOTH paths carry real
    * rows); only those are salted, replicating just the hot build
    * slice, while the cold majority takes the plain equi-join. The
    * oracle is again the PLAIN join — the hybrid split must be
    * result-invisible. SkewSpec proves both paths are non-empty and the
    * row-level result equals the plain join. The >5-lineitems threshold
    * admits a constant FRACTION of orderkeys (not a constant count), so
    * the broadcast bound comes from the explicit top-N cap: only the
    * heaviest 4096 keys are salted, the rest take the plain join —
    * result-identical for any split. */
  private val q86HybridSaltedJoin = QueryDef(
    (s, dir) =>
      graft.core.Skew.hybridSaltedJoin(
          Tables(s, dir, "lineitem")
            .withColumnRenamed("l_orderkey", "o_orderkey"),
          Tables(s, dir, "orders"),
          key = "o_orderkey",
          saltSource = col("l_linenumber"), salts = 8, hotThreshold = 5L,
          maxHotKeys = 4096)
        .groupBy("o_orderstatus")
        .agg(round(sum("l_quantity"), 2).as("sum_qty"),
          count(lit(1)).as("n"))
        .orderBy("o_orderstatus"),
    """SELECT o_orderstatus, round(sum(l_quantity), 2) AS sum_qty,
      |       count(*) AS n
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""")

  /** Array predicate HOFs: exists / forall / filter-count. */
  private val q50ArrayPredicates = QueryDef(
    (s, dir) =>
      Tables(s, dir, "embeddings")
        .select(col("vec_id"),
          exists(col("embedding"), _ > lit(0.3f)).as("has_big"),
          forall(col("embedding"), _ > lit(-1.0f)).as("all_above_neg1"),
          size(filter(col("embedding"), x => abs(x) < lit(0.01f)))
            .cast("long").as("n_small"))
        .orderBy("vec_id"),
    """SELECT vec_id,
      |       len(list_filter(embedding, x -> x > 0.3)) > 0 AS has_big,
      |       len(list_filter(embedding, x -> NOT (x > -1.0))) = 0
      |         AS all_above_neg1,
      |       CAST(len(list_filter(embedding, x -> abs(x) < 0.01)) AS BIGINT)
      |         AS n_small
      |FROM embeddings ORDER BY vec_id""")

  val defs: Map[String, QueryDef] = Map(
    "q41_scala_udf" -> q41Udf,
    "q42_typed_udaf" -> q42Udaf,
    "q43_pivot" -> q43Pivot,
    "q44_multiset_ops" -> q44MultisetOps,
    "q45_posexplode" -> q45Posexplode,
    "q46_map_funcs" -> q46MapFuncs,
    "q47_stats_agg" -> q47Stats,
    "q48_percentile" -> q48Percentile,
    "q49_salted_agg" -> q49SaltedAgg,
    "q83_salted_join" -> q83SaltedJoin,
    "q86_hybrid_salted_join" -> q86HybridSaltedJoin,
    "q50_array_predicates" -> q50ArrayPredicates,
  )
}
