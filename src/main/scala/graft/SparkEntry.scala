package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query naming follows SURVEY.md §2 operator ids (b1_* = builtin step B1,
  * r2_* = reshape R2, j1_* = join pattern J1, ...). Every query reads the
  * driver testdata parquet under `sfDir` and has a DuckDB oracle in
  * [[oracleSql]] with identical column aliases and a total ordering, so the
  * driver's hash compare is deterministic.
  *
  * Exactness convention: aggregate arithmetic is done in DecimalType (exact,
  * order-independent) rather than double, because double summation order
  * differs between Spark partial aggregation and DuckDB. Per-row double
  * arithmetic (same IEEE ops in both engines) is kept as double.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private val dec = DecimalType(18, 2)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("j1_lookup_join")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- aggregation (TPC-H Q1 pricing summary; §2.8 J4 whole-batch agg) ----
    "q1_pricing_summary" -> { (s, dir) =>
      val li = t(s, dir, "lineitem")
      val price = col("l_extendedprice").cast(DecimalType(12, 2))
      val disc  = col("l_discount").cast(DecimalType(4, 2))
      val tax   = col("l_tax").cast(DecimalType(4, 2))
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast(DecimalType(12, 2))).as("sum_qty"),
          sum(price).as("sum_base_price"),
          sum(price * (lit(1).cast(DecimalType(3, 2)) - disc)).as("sum_disc_price"),
          sum(price * (lit(1).cast(DecimalType(3, 2)) - disc) * (lit(1).cast(DecimalType(3, 2)) + tax)).as("sum_charge"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // ---- top-k / limit ----
    "q2_topk_orders" -> { (s, dir) =>
      // orderBy+limit compiles to TakeOrderedAndProject (per-partition top-k,
      // no global sort); the rank window then runs on only 10 rows.
      val w = Window.orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .withColumn("rank", row_number().over(w))
    },

    // ---- J1/J2: lookup join + aggregation into mapping ----
    "j1_lookup_join" -> { (s, dir) =>
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"), "left")
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"), "left")
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          count(lit(1)).as("n_customers"),
          sum(col("c_acctbal").cast(dec)).as("sum_acctbal"))
        .orderBy(col("r_name"), col("n_name"))
    },
    "j2_agg_mapping" -> { (s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("o_orderpriority"))
    },

    // ---- B4: filter_rows (TPC-H Q6-ish; filters push to parquet scan) ----
    "b4_filter_rows" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast(TimestampType) &&
                col("l_shipdate") <  lit("1997-01-01").cast(TimestampType) &&
                col("l_discount").between(0.02, 0.06) &&
                col("l_quantity") < 24)
        .select(col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice") * col("l_discount")).as("revenue"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // ---- B1: drop_duplicate_rows, last-wins (reference keeps LAST dup:
    //      /root/reference/phaser/builtin_steps.py:43-45) ----
    "b1_dedup_last" -> { (s, dir) =>
      // (l_orderkey, l_linenumber) is not unique in the synthetic data, so
      // the "last row" ordering needs a total tiebreak for determinism.
      val w = Window.partitionBy(col("l_orderkey"))
        .orderBy(col("l_linenumber").desc, col("l_quantity").desc,
          col("l_extendedprice").desc, col("l_partkey").desc,
          col("l_suppkey").desc)
      t(s, dir, "lineitem")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .orderBy(col("l_orderkey"))
    },

    // ---- B2: check_unique (dup diagnostics, not data mutation) ----
    "b2_check_unique" -> { (s, dir) =>
      t(s, dir, "documents")
        .groupBy(lower(trim(col("text"))).as("k"))
        .agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") > 1)
        .agg(
          count(lit(1)).cast(LongType).as("n_dup_keys"),
          coalesce(sum(col("cnt")), lit(0L)).cast(LongType).as("n_dup_rows"))
    },

    // ---- B3: sort_by (stable; custkey tiebreak = row-number stability) ----
    "b3_sort_by" -> { (s, dir) =>
      val w = Window.orderBy(col("c_nationkey").asc, col("c_custkey").asc)
      t(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"))
        .withColumn("rank", row_number().over(w))
        .orderBy(col("rank"))
    },

    // ---- R2: pivot ----
    "r2_pivot" -> { (s, dir) =>
      t(s, dir, "events")
        .withColumn("user_bucket", col("user_id") % 10)
        .groupBy(col("user_bucket"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .count()
        .na.fill(0L)
        .orderBy(col("user_bucket"))
    },

    // ---- R3: explode / split ----
    "r3_explode" -> { (s, dir) =>
      t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("token").asc)
        .limit(50) // top-k first; the rank window then sees only 50 rows
        .withColumn("rank",
          row_number().over(Window.orderBy(col("cnt").desc, col("token").asc)))
    },

    // ---- R5: cross-row running state (partition-local, scale-safe) ----
    "r5_running_sum" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          sum(col("o_totalprice").cast(dec)).over(w).as("running_total"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
           sum(CAST(l_quantity AS DECIMAL(12,2))) AS sum_qty,
           sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS sum_base_price,
           sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS sum_disc_price,
           sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS sum_charge,
           count(*) AS count_order
         FROM lineitem GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q2_topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
           row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
         FROM orders ORDER BY rank LIMIT 10""",
    "j1_lookup_join" ->
      """SELECT r_name, n_name, count(*) AS n_customers,
           sum(CAST(c_acctbal AS DECIMAL(18,2))) AS sum_acctbal
         FROM customer
         LEFT JOIN nation ON c_nationkey = n_nationkey
         LEFT JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name ORDER BY r_name, n_name""",
    "j2_agg_mapping" ->
      """SELECT o_orderpriority, count(*) AS n_orders
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "b4_filter_rows" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice * l_discount AS revenue
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
           AND l_discount BETWEEN 0.02 AND 0.06 AND l_quantity < 24
         ORDER BY l_orderkey, l_linenumber""",
    "b1_dedup_last" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM (
           SELECT l_orderkey, l_linenumber, l_quantity,
             row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber DESC,
               l_quantity DESC, l_extendedprice DESC, l_partkey DESC, l_suppkey DESC) AS rn
           FROM lineitem) WHERE rn = 1 ORDER BY l_orderkey""",
    "b2_check_unique" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_dup_keys,
           CAST(coalesce(sum(cnt), 0) AS BIGINT) AS n_dup_rows
         FROM (SELECT lower(trim(text)) AS k, count(*) AS cnt
               FROM documents GROUP BY 1) WHERE cnt > 1""",
    "b3_sort_by" ->
      """SELECT c_custkey, c_nationkey,
           row_number() OVER (ORDER BY c_nationkey ASC, c_custkey ASC) AS rank
         FROM customer ORDER BY rank""",
    "r2_pivot" ->
      """SELECT user_id % 10 AS user_bucket,
           CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
           CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
           CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
           CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
         FROM events GROUP BY 1 ORDER BY user_bucket""",
    "r3_explode" ->
      """SELECT token, cnt,
           row_number() OVER (ORDER BY cnt DESC, token ASC) AS rank
         FROM (
           SELECT token, count(*) AS cnt FROM (
             SELECT unnest(string_split(text, ' ')) AS token FROM documents)
           GROUP BY token)
         ORDER BY cnt DESC, token ASC LIMIT 50""",
    "r5_running_sum" ->
      """SELECT o_custkey, o_orderkey,
           sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_total
         FROM orders ORDER BY o_custkey, o_orderkey"""
  )
}
