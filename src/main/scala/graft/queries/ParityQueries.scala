package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables
import graft.catalog.ParquetCatalog
import graft.sync.{Compare, ParquetSink, Sync}

/** Reference-parity operator inventory (SURVEY §2) as verifiable
  * queries. Each reproduces the *semantics* of SQL the reference pushes
  * to MySQL — projection/rename, NOT IN exclusion, zero-row probe,
  * keyset pagination (single + composite PK), full scan, counts, paged
  * counts, the truncate-load sync round trip, and count compare — plus
  * the relational surface Spark gives for free that the reference lacks
  * (joins beyond the pagination self-join, set ops, rollup/cube,
  * windows), exercised because a user switching engines gets them.
  *
  * Floating-point discipline: aggregates go through DECIMAL casts so
  * results are order-independent and bit-identical to the DuckDB
  * oracle; raw double columns pass through untouched (bit-exact from
  * parquet on both engines). Result schemas never EMIT DecimalType:
  * the exact decimal is cast to DOUBLE (one correctly-rounded
  * conversion, identical in both engines) or VARCHAR as the last step,
  * because the driver's value hash renders DECIMAL differently per
  * engine (round-2 finding: every DECIMAL-output query hash-mismatched
  * while its values compared equal).
  */
object ParityQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private val dec = "decimal(18,4)"
  private val FP = graft.functions.FixedPoint

  val all: Seq[Q] = Seq(
    // R6/R7 — counts and paged counts (cmd/compare.go:112, cmd/root.go:358-364)
    Q(
      "q02_count_star",
      (s, dir) => t(s, dir, "lineitem").agg(count(lit(1)).as("cnt")),
      Some("SELECT count(*) AS cnt FROM lineitem")),
    Q(
      "q03_paged_count",
      (s, dir) =>
        t(s, dir, "lineitem")
          .agg(ceil(count(lit(1)) / lit(100000.0)).cast("bigint").as("total_page_num")),
      Some(
        "SELECT CAST(ceil(count(*) / 100000.0) AS BIGINT) AS total_page_num FROM lineitem")),

    // R1/R2 + lower() — projection with lower-case normalization
    Q(
      "q04_lowercase_project",
      (s, dir) =>
        t(s, dir, "nation")
          .select(col("n_nationkey").as("key"), lower(col("n_name")).as("name")),
      Some("SELECT n_nationkey AS key, lower(n_name) AS name FROM nation")),

    // R3 — the discovery exclusion predicate (NOT IN)
    Q(
      "q05_exclusion_filter",
      (s, dir) =>
        t(s, dir, "nation")
          .filter(!col("n_name").isin("ALGERIA", "KENYA", "CHINA"))
          .select("n_name"),
      Some(
        "SELECT n_name FROM nation WHERE n_name NOT IN ('ALGERIA','KENYA','CHINA')")),

    // R4/S5 — zero-row schema probe (`where 1=0`)
    Q(
      "q06_schema_probe",
      (s, dir) => t(s, dir, "supplier").filter(expr("1=0")),
      Some("SELECT * FROM supplier WHERE 1=0")),

    // S7/R5/R8/R9 — keyset pagination, single-column PK: the deferred-join
    // page (ORDER BY pk LIMIT page, then self LEFT JOIN back for full rows)
    Q(
      "q07_keyset_page",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val keys =
          c.select("c_custkey").orderBy("c_custkey").offset(80).limit(40)
        keys.join(c, Seq("c_custkey"), "left")
          .select("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      },
      Some("""SELECT t.c_custkey, t.c_name, t.c_nationkey, t.c_acctbal, t.c_mktsegment
              FROM (SELECT c_custkey FROM customer ORDER BY c_custkey LIMIT 40 OFFSET 80) temp
              LEFT JOIN customer t ON temp.c_custkey = t.c_custkey""")),

    // S7 composite-PK variant (cmd/root.go:334-357)
    Q(
      "q08_composite_keyset_page",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val keys = li
          .select("l_orderkey", "l_linenumber")
          .orderBy("l_orderkey", "l_linenumber")
          .offset(100)
          .limit(50)
        keys.join(li, Seq("l_orderkey", "l_linenumber"), "left")
          .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
      },
      Some("""SELECT t.l_orderkey, t.l_linenumber, t.l_quantity, t.l_returnflag
              FROM (SELECT l_orderkey, l_linenumber FROM lineitem
                    ORDER BY l_orderkey, l_linenumber LIMIT 50 OFFSET 100) temp
              LEFT JOIN lineitem t ON temp.l_orderkey = t.l_orderkey
                                  AND temp.l_linenumber = t.l_linenumber""")),

    // S6 — full-table scan fallback (no PK)
    Q(
      "q09_full_scan",
      (s, dir) => t(s, dir, "region"),
      Some("SELECT * FROM region")),

    // S9/S11 — truncate-load sync round trip through a sink; the result a
    // user reads back must equal the source exactly.
    Q(
      "q10_sync_roundtrip",
      (s, dir) => {
        val out = java.nio.file.Files
          .createTempDirectory("graft_sync").toString
        val catalog = new ParquetCatalog(dir)
        val sink = ParquetSink(out)
        Sync.syncTable(s, catalog, sink, "nation")
        sink.readBack(s, "nation")
      },
      Some("SELECT * FROM nation")),

    // R12 — compareDb count compare, post-sync (src == dest)
    Q(
      "q11_count_compare",
      (s, dir) => {
        val out = java.nio.file.Files
          .createTempDirectory("graft_cmp").toString
        val catalog = new ParquetCatalog(dir)
        val sink = ParquetSink(out)
        val tables = Seq("region", "nation", "supplier")
        tables.foreach(Sync.syncTable(s, catalog, sink, _))
        import s.implicits._
        Compare.countCompare(s, catalog, sink, tables).toDF()
      },
      Some("""SELECT 'region' AS table_name, count(*) AS src_rows, count(*) AS dest_rows,
                     'YES' AS dest_is_exist, 'YES' AS is_ok FROM region
              UNION ALL
              SELECT 'nation', count(*), count(*), 'YES', 'YES' FROM nation
              UNION ALL
              SELECT 'supplier', count(*), count(*), 'YES', 'YES' FROM supplier""")),

    // R5 generalized — left join + aggregate (orders per customer)
    Q(
      "q12_left_join_agg",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders")
        c.join(o, c("c_custkey") === o("o_custkey"), "left")
          .groupBy(c("c_custkey"))
          .agg(count(o("o_orderkey")).as("n_orders"))
      },
      Some("""SELECT c_custkey, count(o_orderkey) AS n_orders
              FROM customer LEFT JOIN orders ON c_custkey = o_custkey
              GROUP BY c_custkey"""),
      bench = true),

    // §2.3 — the reference's full scalar-function surface
    // (lower, upper, ceil, hex, cast)
    Q(
      "q13_scalar_funcs",
      (s, dir) =>
        t(s, dir, "nation").select(
          col("n_nationkey"),
          lower(col("n_name")).as("lname"),
          upper(col("n_name")).as("uname"),
          ceil(col("n_nationkey") / lit(4.0)).cast("bigint").as("grp"),
          hex(col("n_nationkey")).as("hexkey"),
          col("n_nationkey").cast("string").as("strkey")),
      Some("""SELECT n_nationkey, lower(n_name) AS lname, upper(n_name) AS uname,
                     CAST(ceil(n_nationkey / 4.0) AS BIGINT) AS grp,
                     hex(n_nationkey) AS hexkey,
                     CAST(n_nationkey AS VARCHAR) AS strkey
              FROM nation""")),

    // Free-with-Spark relational surface (SURVEY R14)
    Q(
      "q14_distinct",
      (s, dir) => t(s, dir, "customer").select("c_mktsegment").distinct(),
      Some("SELECT DISTINCT c_mktsegment FROM customer")),
    Q(
      "q15_semi_join",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .select("c_custkey")
      },
      Some("""SELECT c_custkey FROM customer
              WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""")),
    Q(
      "q16_anti_join",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select("c_custkey")
      },
      Some("""SELECT c_custkey FROM customer
              WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""")),
    Q(
      "q17_except",
      (s, dir) => {
        val c = t(s, dir, "customer").select("c_custkey")
        val o = t(s, dir, "orders").select(col("o_custkey").as("c_custkey"))
        c.except(o)
      },
      Some("SELECT c_custkey FROM customer EXCEPT SELECT o_custkey FROM orders")),
    Q(
      "q18_intersect",
      (s, dir) => {
        val c = t(s, dir, "customer").select("c_custkey")
        val o = t(s, dir, "orders").select(col("o_custkey").as("c_custkey"))
        c.intersect(o)
      },
      Some("SELECT c_custkey FROM customer INTERSECT SELECT o_custkey FROM orders")),
    Q(
      "q19_rollup",
      (s, dir) =>
        t(s, dir, "lineitem")
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("cnt")),
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS cnt
              FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""")),
    Q(
      "q20_cube",
      (s, dir) =>
        t(s, dir, "lineitem")
          .cube(col("l_returnflag"), col("l_linestatus"))
          .agg(sum(col("l_quantity").cast(dec)).cast(dec)
            .cast("double").as("sum_qty")),
      Some(s"""SELECT l_returnflag, l_linestatus,
                      CAST(CAST(sum(CAST(l_quantity AS $dec)) AS $dec) AS DOUBLE) AS sum_qty
               FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""")),
    Q(
      "q21_window_topk",
      (s, dir) => {
        val w = Window
          .partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        t(s, dir, "orders")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 2)
          .select("o_custkey", "o_orderkey", "rn")
      },
      Some("""SELECT o_custkey, o_orderkey, rn FROM (
                SELECT o_custkey, o_orderkey,
                       row_number() OVER (PARTITION BY o_custkey
                                          ORDER BY o_totalprice DESC, o_orderkey) AS rn
                FROM orders) x WHERE rn <= 2""")),
    Q(
      "q22_orderby_limit",
      (s, dir) =>
        t(s, dir, "orders")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(10)
          .select("o_orderkey", "o_totalprice"),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
              ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""")),

    // Headline aggregation (TPC-H Q1 shape) — decimal-exact
    Q(
      "q01_pricing_summary",
      (s, dir) =>
        // fixed-point sums: bit-equal to sum(cast(decimal)) at ~40% of
        // its cost — the per-row double→BigDecimal conversion dominates
        // the plain decimal aggregate (see graft.functions.FixedPoint)
        t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            FP.sumFixedDouble(FP.scaled(col("l_quantity"), 4), 4).as("sum_qty"),
            FP.sumFixedDouble(FP.scaled(col("l_extendedprice"), 4), 4).as("sum_base_price"),
            FP.sumFixedDouble(
              FP.scaled(col("l_extendedprice"), 4) *
                (lit(10000L) - FP.scaled(col("l_discount"), 4)),
              4, inputScale = 8).as("sum_disc_price"),
            count(lit(1)).as("count_order")),
      Some(s"""SELECT l_returnflag, l_linestatus,
                      CAST(CAST(sum(CAST(l_quantity AS $dec)) AS $dec) AS DOUBLE) AS sum_qty,
                      CAST(CAST(sum(CAST(l_extendedprice AS $dec)) AS $dec) AS DOUBLE) AS sum_base_price,
                      CAST(CAST(sum(CAST(l_extendedprice AS $dec) *
                          (1 - CAST(l_discount AS $dec))) AS $dec) AS DOUBLE) AS sum_disc_price,
                      count(*) AS count_order
               FROM lineitem GROUP BY l_returnflag, l_linestatus"""),
      bench = true),

    // Headline 3-way join — revenue by market segment
    Q(
      "q23_revenue_by_segment",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val o = t(s, dir, "orders")
        val c = t(s, dir, "customer")
        li.join(o, li("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .groupBy(col("c_mktsegment"))
          .agg(
            FP.sumFixedDouble(
              FP.scaled(col("l_extendedprice"), 4) *
                (lit(10000L) - FP.scaled(col("l_discount"), 4)),
              4, inputScale = 8).as("revenue"),
            count(lit(1)).as("n"))
      },
      Some(s"""SELECT c_mktsegment,
                      CAST(CAST(sum(CAST(l_extendedprice AS $dec) *
                          (1 - CAST(l_discount AS $dec))) AS $dec) AS DOUBLE) AS revenue,
                      count(*) AS n
               FROM lineitem
               JOIN orders ON l_orderkey = o_orderkey
               JOIN customer ON o_custkey = c_custkey
               GROUP BY c_mktsegment"""),
      bench = true),

    Q(
      "q24_count_distinct",
      (s, dir) =>
        t(s, dir, "orders").agg(countDistinct(col("o_custkey")).as("n_custs")),
      Some("SELECT count(DISTINCT o_custkey) AS n_custs FROM orders")),

    // pushdown-visible timestamp filter + aggregation
    Q(
      "q25_date_filter",
      (s, dir) =>
        t(s, dir, "lineitem")
          .filter(col("l_shipdate") >=
            lit(java.sql.Timestamp.valueOf("1995-06-01 00:00:00")))
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"),
            sum(col("l_quantity").cast(dec)).cast(dec)
              .cast("double").as("sum_qty")),
      Some(s"""SELECT l_returnflag, count(*) AS n,
                      CAST(CAST(sum(CAST(l_quantity AS $dec)) AS $dec) AS DOUBLE) AS sum_qty
               FROM lineitem
               WHERE l_shipdate >= TIMESTAMP '1995-06-01 00:00:00'
               GROUP BY l_returnflag""")),

    Q(
      "q26_having",
      (s, dir) =>
        t(s, dir, "orders")
          .groupBy("o_custkey")
          .agg(count(lit(1)).as("n_orders"))
          .filter(col("n_orders") >= 3),
      Some("""SELECT o_custkey, count(*) AS n_orders FROM orders
              GROUP BY o_custkey HAVING count(*) >= 3""")),

    Q(
      "q27_case_bucketing",
      (s, dir) =>
        t(s, dir, "orders")
          .select(
            col("o_orderkey"),
            when(col("o_totalprice") < 1000, lit("small"))
              .when(col("o_totalprice") < 10000, lit("medium"))
              .otherwise(lit("large")).as("band")),
      Some("""SELECT o_orderkey,
                     CASE WHEN o_totalprice < 1000 THEN 'small'
                          WHEN o_totalprice < 10000 THEN 'medium'
                          ELSE 'large' END AS band
              FROM orders""")),

    Q(
      "q28_string_funcs",
      (s, dir) =>
        t(s, dir, "part").select(
          col("p_partkey"),
          substring(col("p_name"), 1, 5).as("prefix"),
          concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
          regexp_replace(col("p_name"), " ", "_").as("snake"),
          length(col("p_name")).as("name_len"),
          lpad(col("p_partkey").cast("string"), 8, "0").as("padded")),
      Some("""SELECT p_partkey,
                     substring(p_name, 1, 5) AS prefix,
                     concat_ws('-', p_brand, p_type) AS brand_type,
                     replace(p_name, ' ', '_') AS snake,
                     length(p_name) AS name_len,
                     lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS padded
              FROM part""")),

    Q(
      "q29_full_outer_join",
      (s, dir) => {
        val c = t(s, dir, "customer")
          .groupBy("c_custkey").agg(count(lit(1)).as("n_c"))
        val o = t(s, dir, "orders")
          .groupBy("o_custkey").agg(count(lit(1)).as("n_o"))
        c.join(o, c("c_custkey") === o("o_custkey"), "full_outer")
          .select(
            coalesce(c("c_custkey"), o("o_custkey")).as("custkey"),
            coalesce(col("n_c"), lit(0L)).as("n_c"),
            coalesce(col("n_o"), lit(0L)).as("n_o"))
      },
      Some("""SELECT coalesce(c.c_custkey, o.o_custkey) AS custkey,
                     coalesce(n_c, 0) AS n_c, coalesce(n_o, 0) AS n_o
              FROM (SELECT c_custkey, count(*) AS n_c FROM customer GROUP BY c_custkey) c
              FULL OUTER JOIN
                   (SELECT o_custkey, count(*) AS n_o FROM orders GROUP BY o_custkey) o
              ON c.c_custkey = o.o_custkey""")),

    Q(
      "q30_max_order_per_cust",
      (s, dir) => {
        val c = t(s, dir, "customer").select("c_custkey")
        val mx = t(s, dir, "orders")
          .groupBy("o_custkey").agg(max("o_totalprice").as("max_price"))
        c.join(mx, c("c_custkey") === mx("o_custkey"), "left")
          .select(col("c_custkey"), col("max_price"))
      },
      Some("""SELECT c_custkey,
                     (SELECT max(o_totalprice) FROM orders
                      WHERE o_custkey = c_custkey) AS max_price
              FROM customer""")),

    // windows beyond rank (q21): running totals, lag deltas, frames,
    // ntile — all ordered by the unique o_orderkey so results are
    // deterministic, with DECIMAL arithmetic shared with the oracle
    Q(
      "q31_running_total",
      (s, dir) => {
        val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
        t(s, dir, "orders").select(
          col("o_custkey"), col("o_orderkey"),
          sum(col("o_totalprice").cast(dec)).over(w).cast(dec)
            .cast("double").as("running_total"))
      },
      Some(s"""SELECT o_custkey, o_orderkey,
                      CAST(CAST(sum(CAST(o_totalprice AS $dec))
                        OVER (PARTITION BY o_custkey ORDER BY o_orderkey)
                        AS $dec) AS DOUBLE) AS running_total
               FROM orders""")),

    Q(
      "q32_lag_delta",
      (s, dir) => {
        val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
        t(s, dir, "orders").select(
          col("o_custkey"), col("o_orderkey"),
          (col("o_totalprice").cast(dec) -
            lag(col("o_totalprice").cast(dec), 1).over(w)).cast(dec)
            .cast("double").as("delta"))
      },
      Some(s"""SELECT o_custkey, o_orderkey,
                      CAST(CAST(CAST(o_totalprice AS $dec) -
                        lag(CAST(o_totalprice AS $dec), 1)
                          OVER (PARTITION BY o_custkey ORDER BY o_orderkey)
                        AS $dec) AS DOUBLE) AS delta
               FROM orders""")),

    Q(
      "q33_moving_sum",
      (s, dir) => {
        val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
          .rowsBetween(-2, 0)
        t(s, dir, "orders").select(
          col("o_custkey"), col("o_orderkey"),
          sum(col("o_totalprice").cast(dec)).over(w).cast(dec)
            .cast("double").as("moving_sum"))
      },
      Some(s"""SELECT o_custkey, o_orderkey,
                      CAST(CAST(sum(CAST(o_totalprice AS $dec))
                        OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                        AS $dec) AS DOUBLE) AS moving_sum
               FROM orders""")),

    // Global ntile/row_number WITHOUT the single-task global window:
    // GlobalOrder range-partitions on the key, ranks per partition, and
    // adds prefix-sum offsets — identical output to the
    // `OVER (ORDER BY ...)` formulation the oracle runs, but the plan
    // keeps N parallel window groups (asserted in PlanShapeSpec).
    Q(
      "q34_ntile_rownum",
      (s, dir) => {
        import graft.operators.GlobalOrder
        val (numbered, total) = GlobalOrder.withRowNumberCounted(
          t(s, dir, "orders").select("o_orderkey"),
          col("o_orderkey"), rnName = "rn")
        numbered.select(
          col("o_orderkey"),
          GlobalOrder.ntileFromRowNumber(col("rn"), total, 4).as("quartile"),
          col("rn").cast("int").as("rn"))
      },
      Some("""SELECT o_orderkey,
                     ntile(4) OVER (ORDER BY o_orderkey) AS quartile,
                     row_number() OVER (ORDER BY o_orderkey) AS rn
              FROM orders""")),

    // exact interpolated percentiles: Spark `percentile` and DuckDB
    // `quantile_cont` share the linear-interpolation formula, so the
    // doubles are bit-identical on the same input set
    Q(
      "q35_percentiles",
      (s, dir) =>
        t(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            expr("percentile(l_quantity, 0.5)").as("med_qty"),
            expr("percentile(l_extendedprice, 0.9)").as("p90_price")),
      Some("""SELECT l_returnflag,
                     quantile_cont(l_quantity, 0.5) AS med_qty,
                     quantile_cont(l_extendedprice, 0.9) AS p90_price
              FROM lineitem GROUP BY l_returnflag""")),

    Q(
      "q36_union_all",
      (s, dir) => {
        val n = t(s, dir, "nation")
        n.filter(col("n_regionkey") <= 2).select(col("n_name"))
          .unionAll(n.filter(col("n_regionkey") >= 2).select(col("n_name")))
      },
      Some("""SELECT n_name FROM nation WHERE n_regionkey <= 2
              UNION ALL
              SELECT n_name FROM nation WHERE n_regionkey >= 2""")),

    Q(
      "q37_grouping_sets",
      (s, dir) => {
        t(s, dir, "lineitem").createOrReplaceTempView("gs_lineitem")
        s.sql("""SELECT l_returnflag, l_linestatus, count(*) AS n
                 FROM gs_lineitem
                 GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""")
      },
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS n
              FROM lineitem
              GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""")),

    // the distributed content-compare the reference can't do: one
    // aggregation pass, order-independent per-column md5 checksums.
    // Double columns (c_acctbal) hash their DECIMAL(28,10) rendering —
    // raw float stringification is engine-shaped, the fixed-scale cast
    // pins one canonical digit string per value on both engines
    Q(
      "q38_content_checksum",
      (s, dir) =>
        Compare.contentChecksum(
          t(s, dir, "customer"),
          Seq("c_custkey", "c_name", "c_mktsegment", "c_acctbal")),
      Some {
        // VARCHAR output: a 38-digit integer is exact as a string in
        // both engines, while DECIMAL and DOUBLE renderings are not
        def ck(c: String, v: String) =
          s"CAST(CAST(sum(CAST(('0x' || substring(md5($v), 1, 15)) AS BIGINT)) AS DECIMAL(38,0)) AS VARCHAR) AS ck_$c"
        def plain(c: String) = ck(c, s"CAST($c AS VARCHAR)")
        val bal = ck("c_acctbal", "CAST(CAST(c_acctbal AS DECIMAL(28,10)) AS VARCHAR)")
        s"SELECT ${plain("c_custkey")}, ${plain("c_name")}, ${plain("c_mktsegment")}, $bal FROM customer"
      }),

    Q(
      "q39_pivot",
      (s, dir) => {
        // explicit value list: no extra distinct-scan job, and the
        // output schema is static (the scale-sane way to pivot)
        val types = Seq("click", "error", "purchase", "signup", "view")
        t(s, dir, "events")
          .groupBy("user_id")
          .pivot("event_type", types)
          .agg(count(lit(1)))
          .na.fill(0L, types)
      },
      Some("""SELECT user_id,
                     count(*) FILTER (WHERE event_type = 'click') AS click,
                     count(*) FILTER (WHERE event_type = 'error') AS error,
                     count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
                     count(*) FILTER (WHERE event_type = 'signup') AS signup,
                     count(*) FILTER (WHERE event_type = 'view') AS view
              FROM events GROUP BY user_id""")),

    Q(
      "q40_collect_sorted",
      (s, dir) =>
        t(s, dir, "events")
          .groupBy("user_id")
          .agg(
            array_join(sort_array(collect_set(col("event_type"))), ",")
              .as("types_seen"),
            countDistinct(col("event_type")).as("n_types")),
      // sort_array makes the set aggregation order-independent — a bare
      // collect_list/list() would be partition-order nondeterministic.
      // The sorted set is emitted JOINED TO A STRING: the comparison
      // harness hashes scalar cells, so an array<string> column (same
      // information) can never hash-match.
      Some("""SELECT user_id,
                     list_aggregate(list_sort(list(DISTINCT event_type)),
                                    'string_agg', ',') AS types_seen,
                     count(DISTINCT event_type) AS n_types
              FROM events GROUP BY user_id""")),

    Q(
      "q41_unpivot",
      (s, dir) => {
        // round-trip of q39: wide per-type counts melted back to rows —
        // Dataset.unpivot is a projection+generate, no shuffle beyond
        // the pivot's own aggregation
        val types = Seq("click", "error", "purchase", "signup", "view")
        t(s, dir, "events")
          .groupBy("user_id")
          .pivot("event_type", types)
          .agg(count(lit(1)))
          .na.fill(0L, types)
          .unpivot(
            Array(col("user_id")), types.map(col).toArray, "event_type", "n")
      },
      Some("""WITH p AS (
                SELECT user_id,
                       count(*) FILTER (WHERE event_type = 'click') AS click,
                       count(*) FILTER (WHERE event_type = 'error') AS error,
                       count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
                       count(*) FILTER (WHERE event_type = 'signup') AS signup,
                       count(*) FILTER (WHERE event_type = 'view') AS view
                FROM events GROUP BY user_id)
              SELECT user_id, event_type, n
              FROM p UNPIVOT (n FOR event_type IN
                (click, error, purchase, signup, view))""")),

    Q(
      "q42_table_profile",
      // the pre-migration diagnostic next to compare/checksum: every
      // lineitem column profiled (nulls, exact distinct, typed
      // min/max, string lengths) as narrow metric rows in ONE
      // aggregation pass; the exact tier is PINNED here for the
      // oracle — the bare profile(df) auto-routes to the HLL sketch
      // tier when plan stats exceed spark.graft.profile.sketchBytes
      (s, dir) => graft.operators.TableProfile.profile(
        t(s, dir, "lineitem"), useSketch = false),
      Some(graft.operators.TableProfile.oracleSql(
        "lineitem", graft.operators.TableProfile.lineitemKinds)),
      bench = true),

    Q(
      "q43_embedding_profile",
      // the VECTOR-table face of the profiler: array columns report
      // dimensionality (a ragged-dim embedding table breaks every
      // ANN/moments operator downstream — this is the cheap check
      // that catches it first), and distinct counts run on the array
      // VALUE (both engines compare lists natively; the Spark side's
      // string key is injective per engine, so counts agree)
      (s, dir) => graft.operators.TableProfile.profile(
        t(s, dir, "embeddings"), useSketch = false),
      Some(graft.operators.TableProfile.oracleSql(
        "embeddings", graft.operators.TableProfile.embeddingsKinds))),

    Q(
      "q44_fk_audit",
      // referential-integrity audit — the check a user runs after a
      // sync / delta repair touched only SOME tables (an interrupted
      // truncate-load or a one-table repair leaves dangling children):
      // per child→parent relation, child rows whose FK has no parent.
      // Each relation is one ids-only left join against the DISTINCT
      // parent keys (AQE broadcasts the small parent sides) and one
      // algebraic rollup. A sentinel orphan (fk = -999) is planted
      // in-query per relation so the detector's positive path is
      // value-verified, not just its all-green path.
      (s, dir) => {
        import org.apache.spark.sql.functions._
        def audit(name: String, child: org.apache.spark.sql.DataFrame,
            fk: String, parent: org.apache.spark.sql.DataFrame,
            pk: String) =
          child.select(col(fk).cast("long").as("fk"))
            .unionByName(s.range(1).select(lit(-999L).as("fk")))
            .join(parent.select(col(pk).cast("long").as("fk")).distinct()
              .withColumn("hit", lit(1L)), Seq("fk"), "left")
            .agg(count(lit(1)).as("n_child"),
              sum(when(col("hit").isNull, 1L).otherwise(0L))
                .cast("bigint").as("n_orphans"))
            .select(lit(name).as("relation"), col("n_child"),
              col("n_orphans"),
              floor((col("n_orphans") * lit(1000L)).cast("double") /
                col("n_child").cast("double")).cast("long")
                .as("orphan_milli"))
        Seq(
          audit("lineitem->orders", t(s, dir, "lineitem"), "l_orderkey",
            t(s, dir, "orders"), "o_orderkey"),
          audit("orders->customer", t(s, dir, "orders"), "o_custkey",
            t(s, dir, "customer"), "c_custkey"),
          audit("customer->nation", t(s, dir, "customer"), "c_nationkey",
            t(s, dir, "nation"), "n_nationkey"),
          audit("supplier->nation", t(s, dir, "supplier"), "s_nationkey",
            t(s, dir, "nation"), "n_nationkey"))
          .reduce(_ unionByName _)
      },
      Some {
        def rel(name: String, child: String, fk: String,
            parent: String, pk: String) =
          s"""SELECT '$name' AS relation,
             |  count(*)::BIGINT AS n_child,
             |  CAST(sum(CASE WHEN p.fk IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_orphans,
             |  CAST(floor(CAST(sum(CASE WHEN p.fk IS NULL THEN 1 ELSE 0 END)
             |                  * 1000 AS DOUBLE)
             |             / CAST(count(*) AS DOUBLE)) AS BIGINT)
             |    AS orphan_milli
             |FROM (SELECT CAST($fk AS BIGINT) AS fk FROM $child
             |      UNION ALL SELECT -999) c
             |LEFT JOIN (SELECT DISTINCT CAST($pk AS BIGINT) AS fk
             |           FROM $parent) p ON c.fk = p.fk""".stripMargin
        Seq(
          rel("lineitem->orders", "lineitem", "l_orderkey",
            "orders", "o_orderkey"),
          rel("orders->customer", "orders", "o_custkey",
            "customer", "c_custkey"),
          rel("customer->nation", "customer", "c_nationkey",
            "nation", "n_nationkey"),
          rel("supplier->nation", "supplier", "s_nationkey",
            "nation", "n_nationkey")).mkString("\nUNION ALL\n")
      })
  )
}
