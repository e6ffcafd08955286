package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Relational._

/** Driver contract — see SURVEY.md §7 + TESTDATA.md.
  *
  * Each entry in [[queries]] is one operator/capability from SURVEY.md §2
  * (or a north-star extension), expressed Spark-first over the driver's
  * parquet fixtures. [[oracleSql]] holds the DuckDB-equivalent ANSI SQL the
  * driver hash-compares against at sf0.01.
  *
  * Determinism rules (SURVEY.md §5, §7 "oracle agreement traps"):
  *  - every aggregate of a double column goes through an exact decimal sum
  *    ([[graft.ops.Relational.dsum]]) so results are independent of
  *    partial-aggregation order and identical across engines;
  *  - every query ends in a total ORDER BY (all key columns);
  *  - window orderings carry a unique tie-breaker;
  *  - computed columns are aliased to the same name on both sides.
  */
object SparkEntry {

  private def T(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** (name, spark impl, optional DuckDB oracle). */
  private type QEntry =
    (String, (SparkSession, String) => DataFrame, Option[String])

  // ---------------------------------------------------------------------
  // Core relational queries (SURVEY §2.2, §2.4, §2.5, §2.6, §2.7, §2.8)
  // ---------------------------------------------------------------------

  private val DEC = "decimal(27,4)"

  private def coreQueries: Seq[QEntry] = Seq(
    (
      // A1/A2/A3: grouped sums + averages + counts (pricing summary).
      "q01_pricing_summary",
      (s, dir) => {
        T(s, dir, "lineitem")
          .where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_base_price"),
            dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 8)
              .as("sum_disc_price"),
            davg(col("l_quantity")).as("avg_qty"),
            davg(col("l_discount"), 8).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some("""
        SELECT l_returnflag, l_linestatus,
          CAST(sum(CAST(l_quantity AS DECIMAL(27,4))) AS DOUBLE) AS sum_qty,
          CAST(sum(CAST(l_extendedprice AS DECIMAL(27,4))) AS DOUBLE) AS sum_base_price,
          CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,8))) AS DOUBLE) AS sum_disc_price,
          CAST(sum(CAST(l_quantity AS DECIMAL(27,4))) AS DOUBLE) / count(*) AS avg_qty,
          CAST(sum(CAST(l_discount AS DECIMAL(27,8))) AS DOUBLE) / count(*) AS avg_disc,
          count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")
    ),
    (
      // P3/P4/P10: filter + narrow projection (pushed to the parquet scan).
      "q02_filter_project",
      (s, dir) => {
        T(s, dir, "lineitem")
          .where(col("l_quantity") >= 45 && col("l_returnflag") === "R")
          .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""
        SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        FROM lineitem
        WHERE l_quantity >= 45 AND l_returnflag = 'R'
        ORDER BY l_orderkey, l_linenumber""")
    ),
    (
      // J1 + A1: 3-way join, grouped revenue per market segment.
      "q03_segment_revenue",
      (s, dir) => {
        val c = T(s, dir, "customer")
        val o = T(s, dir, "orders")
        val l = T(s, dir, "lineitem")
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .groupBy("c_mktsegment")
          .agg(
            dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 8)
              .as("revenue"),
            countDistinct(col("o_orderkey")).as("n_orders"))
          .orderBy("c_mktsegment")
      },
      Some("""
        SELECT c_mktsegment,
          CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,8))) AS DOUBLE) AS revenue,
          count(DISTINCT o_orderkey) AS n_orders
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment""")
    ),
    (
      // J1 denormalize: fact + 3 broadcast dims (region/nation via supplier).
      "q04_region_revenue",
      (s, dir) => {
        val l = T(s, dir, "lineitem")
        val denorm = denormalize(l, Seq(
          (T(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey")),
          (T(s, dir, "nation"), col("s_nationkey") === col("n_nationkey")),
          (T(s, dir, "region"), col("n_regionkey") === col("r_regionkey"))))
        denorm
          .groupBy("r_name", "n_name")
          .agg(
            dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 8)
              .as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy("r_name", "n_name")
      },
      Some("""
        SELECT r_name, n_name,
          CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,8))) AS DOUBLE) AS revenue,
          count(*) AS n_items
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
        ORDER BY r_name, n_name""")
    ),
    (
      // W1: top-k per group with deterministic tie-breaker.
      "q05_topk_orders",
      (s, dir) => {
        val o = T(s, dir, "orders")
          .withColumn("o_year", year(col("o_orderdate")).cast("int"))
        topKPerGroup(o,
          partitionCols = Seq(col("o_orderstatus"), col("o_year")),
          order = Seq(col("o_totalprice").desc, col("o_orderkey").asc),
          k = 5)
          .select("o_orderstatus", "o_year", "rank", "o_orderkey", "o_totalprice")
          .orderBy("o_orderstatus", "o_year", "rank")
      },
      Some("""
        SELECT o_orderstatus, o_year, rank, o_orderkey, o_totalprice
        FROM (
          SELECT o_orderstatus,
            CAST(year(o_orderdate) AS INTEGER) AS o_year,
            row_number() OVER (
              PARTITION BY o_orderstatus, year(o_orderdate)
              ORDER BY o_totalprice DESC, o_orderkey) AS rank,
            o_orderkey, o_totalprice
          FROM orders) t
        WHERE rank <= 5
        ORDER BY o_orderstatus, o_year, rank""")
    ),
    (
      // J2: year-over-year diff via self-join of aggregates (reference shape).
      "q06_yoy_join",
      (s, dir) => {
        val byYear = T(s, dir, "orders")
          .groupBy(year(col("o_orderdate")).cast("int").as("o_year"))
          .agg(dsum(col("o_totalprice")).as("revenue"))
        yoyJoin(byYear, "o_year", "revenue").orderBy("o_year")
      },
      Some("""
        WITH by_year AS (
          SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
            CAST(sum(CAST(o_totalprice AS DECIMAL(27,4))) AS DOUBLE) AS revenue
          FROM orders GROUP BY 1)
        SELECT cur.o_year AS o_year, cur.revenue AS revenue,
          prev.revenue AS prev_revenue,
          cur.revenue - prev.revenue AS revenue_diff
        FROM by_year cur
        JOIN by_year prev ON cur.o_year = prev.o_year + 1
        ORDER BY o_year""")
    ),
    (
      // W1 analytic variant: same YoY via lag() (single window, no join).
      "q07_yoy_lag",
      (s, dir) => {
        val byYear = T(s, dir, "orders")
          .groupBy(year(col("o_orderdate")).cast("int").as("o_year"))
          .agg(dsum(col("o_totalprice")).as("revenue"))
        yoyLag(byYear, "o_year", "revenue").orderBy("o_year")
      },
      Some("""
        SELECT o_year, revenue,
          lag(revenue) OVER (ORDER BY o_year) AS prev_revenue,
          revenue - lag(revenue) OVER (ORDER BY o_year) AS revenue_diff
        FROM (
          SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
            CAST(sum(CAST(o_totalprice AS DECIMAL(27,4))) AS DOUBLE) AS revenue
          FROM orders GROUP BY 1) t
        ORDER BY o_year""")
    ),
    (
      // R1: unpivot wide->long via the built-in Dataset.unpivot.
      "q08_unpivot_measures",
      (s, dir) => {
        T(s, dir, "lineitem")
          .where(col("l_orderkey") < 1000)
          .unpivot(
            Array(col("l_orderkey"), col("l_linenumber")),
            Array(col("l_quantity"), col("l_extendedprice"),
              col("l_discount"), col("l_tax")),
            "measure", "value")
          .orderBy("l_orderkey", "l_linenumber", "measure")
      },
      Some("""
        SELECT l_orderkey, l_linenumber, measure, value FROM (
          SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS value FROM lineitem WHERE l_orderkey < 1000
          UNION ALL
          SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem WHERE l_orderkey < 1000
          UNION ALL
          SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem WHERE l_orderkey < 1000
          UNION ALL
          SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem WHERE l_orderkey < 1000) t
        ORDER BY l_orderkey, l_linenumber, measure""")
    ),
    (
      // R2: pivot long->wide (inverse of R1), fixed pivot values.
      "q09_pivot_status",
      (s, dir) => {
        T(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .pivot("l_linestatus", Seq("F", "O"))
          .agg(dsum(col("l_quantity")))
          .orderBy("l_returnflag")
      },
      Some("""
        SELECT l_returnflag,
          CAST(sum(CAST(CASE WHEN l_linestatus = 'F' THEN l_quantity END AS DECIMAL(27,4))) AS DOUBLE) AS F,
          CAST(sum(CAST(CASE WHEN l_linestatus = 'O' THEN l_quantity END AS DECIMAL(27,4))) AS DOUBLE) AS O
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag""")
    ),
    (
      // C2: distinct on a projection.
      "q10_distinct",
      (s, dir) => {
        T(s, dir, "customer")
          .select("c_nationkey", "c_mktsegment")
          .distinct()
          .orderBy("c_nationkey", "c_mktsegment")
      },
      Some("""
        SELECT DISTINCT c_nationkey, c_mktsegment
        FROM customer
        ORDER BY c_nationkey, c_mktsegment""")
    ),
    (
      // A-extension: exact count-distinct per group (SURVEY §2.5 note).
      "q11_count_distinct",
      (s, dir) => {
        T(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            countDistinct(col("l_partkey")).as("n_parts"),
            countDistinct(col("l_suppkey")).as("n_supps"),
            count(lit(1)).as("n_rows"))
          .orderBy("l_returnflag")
      },
      Some("""
        SELECT l_returnflag,
          count(DISTINCT l_partkey) AS n_parts,
          count(DISTINCT l_suppkey) AS n_supps,
          count(*) AS n_rows
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag""")
    ),
    (
      // A-extension: rollup (grouping-sets family).
      "q12_rollup",
      (s, dir) => {
        T(s, dir, "orders")
          .rollup("o_orderstatus", "o_orderpriority")
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .orderBy(col("o_orderstatus").asc_nulls_first,
            col("o_orderpriority").asc_nulls_first)
      },
      Some("""
        SELECT o_orderstatus, o_orderpriority, count(*) AS n,
          CAST(sum(CAST(o_totalprice AS DECIMAL(27,4))) AS DOUBLE) AS total
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""")
    ),
    (
      // A-extension: cube.
      "q13_cube",
      (s, dir) => {
        T(s, dir, "lineitem")
          .cube("l_returnflag", "l_linestatus")
          .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
          .orderBy(col("l_returnflag").asc_nulls_first,
            col("l_linestatus").asc_nulls_first)
      },
      Some("""
        SELECT l_returnflag, l_linestatus, count(*) AS n,
          CAST(sum(CAST(l_quantity AS DECIMAL(27,4))) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
        ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")
    ),
    (
      // Join-shape matrix (SURVEY §2.4): left-semi = EXISTS.
      "q14_semi_join",
      (s, dir) => {
        val bigOrders = T(s, dir, "orders").where(col("o_totalprice") > 300000)
        T(s, dir, "customer")
          .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_semi")
          .select("c_custkey", "c_name", "c_mktsegment")
          .orderBy("c_custkey")
      },
      Some("""
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
        ORDER BY c_custkey""")
    ),
    (
      // Join-shape matrix: left-anti = NOT EXISTS.
      "q15_anti_join",
      (s, dir) => {
        val bigOrders = T(s, dir, "orders").where(col("o_totalprice") > 300000)
        T(s, dir, "customer")
          .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_anti")
          .select("c_custkey", "c_name", "c_mktsegment")
          .orderBy("c_custkey")
      },
      Some("""
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
        ORDER BY c_custkey""")
    ),
    (
      // Join-shape matrix: left outer + null-coalescing aggregates.
      "q16_left_join",
      (s, dir) => {
        val perCust = T(s, dir, "orders")
          .groupBy("o_custkey")
          .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("tot"))
        T(s, dir, "customer")
          .join(perCust, col("c_custkey") === col("o_custkey"), "left")
          .select(
            col("c_custkey"), col("c_mktsegment"),
            coalesce(col("cnt"), lit(0L)).as("n_orders"),
            coalesce(col("tot"), lit(0.0)).as("total_spent"))
          .orderBy("c_custkey")
      },
      Some("""
        SELECT c_custkey, c_mktsegment,
          COALESCE(cnt, 0) AS n_orders,
          COALESCE(tot, 0.0) AS total_spent
        FROM customer
        LEFT JOIN (
          SELECT o_custkey, count(*) AS cnt,
            CAST(sum(CAST(o_totalprice AS DECIMAL(27,4))) AS DOUBLE) AS tot
          FROM orders GROUP BY o_custkey) t
        ON c_custkey = o_custkey
        ORDER BY c_custkey""")
    )
  )

  private def registry: Seq[QEntry] = coreQueries

  /** Flagship query on sf=0.001; driver smoke-checks rows>0.
    * Full slice: scan -> filter -> broadcast-join -> agg -> window top-k.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val l = T(spark, dir, "lineitem")
    val denorm = denormalize(l, Seq(
      (T(spark, dir, "supplier"), col("l_suppkey") === col("s_suppkey")),
      (T(spark, dir, "nation"), col("s_nationkey") === col("n_nationkey")),
      (T(spark, dir, "region"), col("n_regionkey") === col("r_regionkey"))))
    val agg = denorm
      .groupBy("r_name", "n_name")
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 8)
        .as("revenue"))
    topKPerGroup(agg, Seq(col("r_name")),
      Seq(col("revenue").desc, col("n_name").asc), k = 3)
      .orderBy("r_name", "rank")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (n, f, _) => n -> f }.toMap

  /** DuckDB-equivalent ANSI SQL per query (driver correctness oracle). */
  def oracleSql: Map[String, String] =
    registry.collect { case (n, _, Some(sql)) =>
      n -> sql.linesIterator.map(_.trim).filter(_.nonEmpty).mkString(" ")
    }.toMap
}
