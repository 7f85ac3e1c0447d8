package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.core.{QueryDef, Tables}

/** Scalar-function coverage (SURVEY.md §2.5): string, date/time, math,
  * array (higher-order), and JSON functions — all codegen'd builtins, no
  * UDFs, so every one of these stays inside WholeStageCodegen.
  *
  * Cross-engine typing: DuckDB returns BIGINT where Spark returns INT for
  * length/strpos/year/etc — Spark side casts to long so parquet schemas
  * line up with the oracle result.
  */
object Functions {

  private val q21String = QueryDef(
    (s, dir) =>
      Tables(s, dir, "part")
        .select(
          col("p_partkey"),
          upper(col("p_brand")).as("brand_upper"),
          lower(col("p_type")).as("type_lower"),
          substring(col("p_name"), 1, 8).as("name_prefix"),
          length(col("p_name")).cast("long").as("name_len"),
          concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
          regexp_extract(col("p_name"), "^(\\w+)", 1).as("first_word"),
          regexp_replace(col("p_name"), "[aeiou]", "").as("no_vowels"),
          instr(col("p_name"), "r").cast("long").as("first_r"),
          lpad(col("p_brand"), 12, ".").as("brand_padded"),
          trim(lit("  x  ")).as("trimmed"),
          split(col("p_name"), " ").getItem(0).as("split_head"))
        .orderBy("p_partkey"),
    """SELECT p_partkey,
      |       upper(p_brand) AS brand_upper,
      |       lower(p_type)  AS type_lower,
      |       substring(p_name, 1, 8) AS name_prefix,
      |       CAST(length(p_name) AS BIGINT) AS name_len,
      |       p_brand || '|' || p_type AS brand_type,
      |       regexp_extract(p_name, '^(\w+)', 1) AS first_word,
      |       regexp_replace(p_name, '[aeiou]', '', 'g') AS no_vowels,
      |       CAST(strpos(p_name, 'r') AS BIGINT) AS first_r,
      |       lpad(p_brand, 12, '.') AS brand_padded,
      |       trim('  x  ') AS trimmed,
      |       string_split(p_name, ' ')[1] AS split_head
      |FROM part ORDER BY p_partkey""")

  private val q22Date = QueryDef(
    (s, dir) =>
      Tables(s, dir, "orders")
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("order_year"),
          month(col("o_orderdate")).cast("long").as("order_month"),
          dayofmonth(col("o_orderdate")).cast("long").as("order_day"),
          quarter(col("o_orderdate")).cast("long").as("order_quarter"),
          unix_timestamp(col("o_orderdate")).as("epoch_s"),
          unix_timestamp(date_trunc("month", col("o_orderdate")))
            .as("month_start_epoch"),
          date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
        .orderBy("o_orderkey"),
    """SELECT o_orderkey,
      |       year(o_orderdate)    AS order_year,
      |       month(o_orderdate)   AS order_month,
      |       day(o_orderdate)     AS order_day,
      |       quarter(o_orderdate) AS order_quarter,
      |       CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
      |       CAST(epoch(date_trunc('month', o_orderdate)) AS BIGINT)
      |         AS month_start_epoch,
      |       strftime(o_orderdate, '%Y-%m') AS ym
      |FROM orders ORDER BY o_orderkey""")

  private val q23Math = QueryDef(
    (s, dir) =>
      Tables(s, dir, "part")
        .select(
          col("p_partkey"),
          round(sqrt(col("p_retailprice")), 6).as("price_sqrt"),
          abs(col("p_size") - lit(25)).cast("long").as("size_dev"),
          floor(col("p_retailprice")).cast("long").as("price_floor"),
          ceil(col("p_retailprice")).cast("long").as("price_ceil"),
          (col("p_size") % 7).as("size_mod7"),
          greatest(col("p_size"), lit(25)).as("size_hi"),
          least(col("p_size"), lit(25)).as("size_lo"),
          round(col("p_retailprice") * 1.1, 2).as("price_bumped"))
        .orderBy("p_partkey"),
    """SELECT p_partkey,
      |       round(sqrt(p_retailprice), 6) AS price_sqrt,
      |       CAST(abs(p_size - 25) AS BIGINT) AS size_dev,
      |       CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
      |       CAST(ceil(p_retailprice) AS BIGINT)  AS price_ceil,
      |       p_size % 7 AS size_mod7,
      |       greatest(p_size, 25) AS size_hi,
      |       least(p_size, 25)    AS size_lo,
      |       round(p_retailprice * 1.1, 2) AS price_bumped
      |FROM part ORDER BY p_partkey""")

  /** Higher-order array functions over the embedding column: everything a
    * vector pipeline needs without ever leaving codegen — size, element
    * access, elementwise transform + fold (L2 norm), min/max. */
  private val q24Array = QueryDef(
    (s, dir) =>
      Tables(s, dir, "embeddings")
        .select(
          col("vec_id"),
          size(col("embedding")).cast("long").as("dim"),
          element_at(col("embedding"), 1).as("first_elem"),
          array_max(col("embedding")).as("max_elem"),
          array_min(col("embedding")).as("min_elem"),
          round(
            aggregate(col("embedding"), lit(0.0),
              (acc, x) => acc + x.cast("double") * x.cast("double")),
            6).as("sq_sum"),
          round(
            sqrt(aggregate(col("embedding"), lit(0.0),
              (acc, x) => acc + x.cast("double") * x.cast("double"))),
            6).as("l2_norm"),
          size(filter(col("embedding"), _ > lit(0.0f))).cast("long")
            .as("n_positive"))
        .orderBy("vec_id"),
    """SELECT vec_id,
      |       CAST(len(embedding) AS BIGINT) AS dim,
      |       embedding[1] AS first_elem,
      |       list_max(embedding) AS max_elem,
      |       list_min(embedding) AS min_elem,
      |       round(list_sum(list_transform(embedding,
      |         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 6) AS sq_sum,
      |       round(sqrt(list_sum(list_transform(embedding,
      |         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2_norm,
      |       CAST(len(list_filter(embedding, x -> x > 0.0)) AS BIGINT)
      |         AS n_positive
      |FROM embeddings ORDER BY vec_id""")

  /** JSON functions over the events.props payload — the engine analog of
    * the reference's JSON-everywhere dataflow (SURVEY.md §2.5 JSON row). */
  private val q25Json = QueryDef(
    (s, dir) =>
      Tables(s, dir, "events")
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k_value"),
          from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("k",
              org.apache.spark.sql.types.LongType))))
            .getField("k").as("k_typed"),
          (get_json_object(col("props"), "$.k").cast("long") % 10)
            .as("k_mod10"))
        .orderBy("event_id"),
    """SELECT event_id,
      |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
      |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_typed,
      |       CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod10
      |FROM events ORDER BY event_id""")

  /** Conditional expressions: CASE WHEN / coalesce / nullif banding. */
  private val q26Conditional = QueryDef(
    (s, dir) =>
      Tables(s, dir, "customer")
        .select(
          col("c_custkey"),
          when(col("c_acctbal") < 0, "overdrawn")
            .when(col("c_acctbal") < 5000, "standard")
            .otherwise("premium").as("tier"),
          coalesce(nullif(col("c_mktsegment"), lit("BUILDING")),
            lit("REDACTED")).as("segment_masked"))
        .orderBy("c_custkey"),
    """SELECT c_custkey,
      |       CASE WHEN c_acctbal < 0 THEN 'overdrawn'
      |            WHEN c_acctbal < 5000 THEN 'standard'
      |            ELSE 'premium' END AS tier,
      |       coalesce(nullif(c_mktsegment, 'BUILDING'), 'REDACTED')
      |         AS segment_masked
      |FROM customer ORDER BY c_custkey""")

  val defs: Map[String, QueryDef] = Map(
    "q21_string_funcs" -> q21String,
    "q22_date_funcs" -> q22Date,
    "q23_math_funcs" -> q23Math,
    "q24_array_funcs" -> q24Array,
    "q25_json_funcs" -> q25Json,
    "q26_conditional" -> q26Conditional,
  )
}
