package graft.queries

import graft.Tables
import graft.functions.{ExactNum, TextFunctions, VectorFunctions}
import graft.operators.{Dedup, Sessionize, Similarity, WindowedAgg}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational family: joins of every type, set ops, grouping
  * analytics (rollup/cube/grouping sets), window functions, and exact
  * decimal aggregation over the TPC-H-ish tables.
  *
  * Mixed into [[QueryPack]]; oracle SQL for each query lives beside its
  * Spark form in [[relationalOracles]].
  */
private[queries] trait RelationalQueries {
  import ExactNum._
  import SqlTwins._


  /** TPC-H Q1-shaped pricing summary: filter → groupBy → multi-SUM.
    * The reference's windowed multi-column SUM pattern
    * (ErrorAggregatorBase.scala:238-255) minus the time window.
    */
  def pricingSummary(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit(ShipCutoff).cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        davg(col("l_quantity")).as("avg_qty"),
        count(lit(1)).as("count_order"))

  /** Star join: fact orders ⋈ customer, dims nation/region broadcast.
    * Orders pre-aggregate per customer BELOW the join, so the fact-side
    * shuffle carries one row per customer (the exact-decimal partial sums
    * re-aggregate without precision loss); dims broadcast. At 100 TB the
    * orders⋈customer stage stays a key-shuffle join, but on reduced rows.
    */
  def regionRevenue(s: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice").cast(ExactNum.Dec)).as("cust_rev_dec"),
           count(lit(1)).as("cust_orders"))
    perCust
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(sum(col("cust_rev_dec")).cast("double").as("revenue"),
           sum(col("cust_orders")).as("n_orders"))
  }

  /** Big-big join lineitem ⋈ orders with distinct aggregation. Lineitem
    * partial-aggregates per order key BELOW the join: the join then sees
    * one row per order, COUNT(DISTINCT l_orderkey) degenerates to a plain
    * COUNT (no distinct expansion after the join), and the shuffle
    * carries |orders| rows instead of |lineitem| — the rewrite that keeps
    * this plan viable when lineitem is the 100 TB side.
    */
  def joinPriority(s: SparkSession, dir: String): DataFrame = {
    val perOrder = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_extendedprice").cast(ExactNum.Dec)).as("order_price_dec"))
    perOrder
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
           sum(col("order_price_dec")).cast("double").as("sum_price"))
  }

  /** Deterministic top-k: TakeOrderedAndProject, no full sort at scale. */
  def topkOrders(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))

  /** Analytic window function: top-3 orders per customer. */
  def windowRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(s, dir)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("rank"))
  }

  /** NOT EXISTS as a left-anti join (no subquery re-execution): customers
    * that never placed a pending order.
    */
  def antiJoin(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir).filter(col("o_orderstatus") === "P"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))

  /** EXISTS as a left-semi join. */
  def semiJoin(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir).filter(col("o_orderstatus") === "F"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_customers"))

  def distinctAgg(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_suppkey")).as("n_suppliers"),
           countDistinct(col("l_partkey")).as("n_parts"))

  def unionNations(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir).select(col("c_nationkey").as("nationkey"))
      .union(Tables.supplier(s, dir).select(col("s_nationkey").as("nationkey")))
      .distinct()

  /** ROLLUP hierarchy totals (engine breadth beyond the reference). */
  def rollupSummary(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))

  /** CUBE: totals over every dimension subset (q33 is the ROLLUP twin). */
  def cubeSummary(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))

  /** INTERSECT / EXCEPT set operations, tagged into one relation. */
  def setOpsNations(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).select(col("c_nationkey").as("nationkey")).distinct()
    val sup = Tables.supplier(s, dir).select(col("s_nationkey").as("nationkey")).distinct()
    c.intersect(sup).withColumn("tag", lit("both"))
      .union(c.except(sup).withColumn("tag", lit("customers_only")))
  }

  /** Running total per customer — window frame aggregation. */
  def runningTotal(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, dir)
      .filter(col("o_custkey") < 100)
      .withColumn("running_total",
        sum(col("o_totalprice").cast(ExactNum.Dec)).over(w).cast("double"))
      .select(col("o_custkey"), col("o_orderkey"), col("running_total"))
  }

  /** Scalar-subquery shape: customers above the global average balance. */
  def aboveAvgBalance(s: SparkSession, dir: String): DataFrame = {
    val globalAvg = Tables.customer(s, dir).agg(davg(col("c_acctbal")).as("avg_bal"))
    Tables.customer(s, dir)
      .crossJoin(broadcast(globalAvg))
      .filter(col("c_acctbal") > col("avg_bal"))
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_above"))
  }

  /** Exact continuous percentiles per group (sort-based, both engines
    * interpolate identically on identical inputs).
    */
  def percentiles(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.5)").as("p50_qty"),
        expr("percentile(l_quantity, 0.95)").as("p95_qty"),
        count(lit(1)).as("n"))

  /** Fixed-width bucket histogram of order totals. */
  def priceHistogram(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .withColumn("bucket", floor(col("o_totalprice") / 50000.0).cast("long"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("bucket_total"))

  /** GROUPING SETS — the explicit-subset sibling of ROLLUP/CUBE, via the
    * Spark 4 `groupingSets` Dataset API. */
  def groupingSetsSummary(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_returnflag"), col("l_linestatus")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))

  /** Correlated-subquery shape: orders strictly above their own customer's
    * average order value. Spark decorrelates by hand — one window pass
    * computes each customer's (sum, count); the oracle states the classic
    * correlated form and lets DuckDB decorrelate. The comparison is the
    * DIVISION-FREE exact-decimal cross-multiplication
    * price·cnt > sum — no engine-dependent rounding at the boundary.
    */
  def aboveOwnAvg(s: SparkSession, dir: String): DataFrame = {
    // decimal(20,6) price × decimal(8,0) count stays within decimal(38,_)
    // in both engines (o_totalprice < 10^7, per-customer orders < 10^8)
    val d20 = org.apache.spark.sql.types.DecimalType(20, 6)
    val w = Window.partitionBy(col("o_custkey"))
    Tables.orders(s, dir)
      .withColumn("sum_dec", sum(col("o_totalprice").cast(d20)).over(w))
      .withColumn("cnt", count(lit(1)).over(w))
      .filter(col("o_totalprice").cast(d20) *
        col("cnt").cast(org.apache.spark.sql.types.DecimalType(8, 0)) > col("sum_dec"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_above"),
           countDistinct(col("o_custkey")).as("n_customers"))
  }

  /** Deterministic per-group MODE: most frequent l_quantity per return
    * flag, smallest value on count ties — counts-then-rank, the exact
    * two-phase form both engines compute identically (native mode()
    * functions break ties arbitrarily).
    */
  def modeQuantity(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"), col("l_quantity")).agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("c").desc, col("l_quantity").asc)
    counts.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("l_returnflag"), col("l_quantity").as("mode_qty"),
        col("c").as("mode_n"))
  }

  /** FULL OUTER join — per-nation counts of one market segment's
    * customers vs high-balance suppliers, where either side of a nation
    * may be absent. The reference has no joins at all (SURVEY §2.4); this
    * completes the engine's join-type inventory (inner/semi/anti/left/
    * full/cross are all exercised across the pack).
    */
  def fullOuterNation(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "MACHINERY")
      .groupBy(col("c_nationkey").as("nationkey")).agg(count(lit(1)).as("n_cust"))
    val sup = Tables.supplier(s, dir).filter(col("s_acctbal") > 9000.0)
      .groupBy(col("s_nationkey").as("nationkey")).agg(count(lit(1)).as("n_supp"))
    c.join(sup, Seq("nationkey"), "full_outer")
      .select(col("nationkey"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
  }

  /** NTILE quartiles of customer balance within each market segment —
    * the bucketing window function (q05/q35/q57 cover rank/frame/lag).
    * Fully deterministic: the order key (acctbal, custkey) is total.
    */
  def ntileQuartiles(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    Tables.customer(s, dir)
      .withColumn("quartile", ntile(4).over(w))
      .groupBy(col("c_mktsegment"), col("quartile"))
      .agg(count(lit(1)).as("n"), davg(col("c_acctbal")).as("avg_bal"))
  }

  /** Calendar aggregation: orders per month (year·100+month key) —
    * date-part extraction coverage. Integer month keys keep the grouping
    * timezone-free in both engines.
    */
  def monthlyOrders(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .withColumn("ym",
        (year(col("o_orderdate")) * 100 + month(col("o_orderdate"))).cast("int"))
      .groupBy(col("ym"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))

  /** RANGE-frame window: for each order, how many orders the same
    * customer placed in the trailing 30 days — a VALUE-range frame (vs
    * q35's ROWS frame), deterministic regardless of tie order because
    * the frame is defined on the day value itself. Day numbers stay on
    * integer arithmetic (timezone-free, exact).
    */
  def trailingWindowOrders(s: SparkSession, dir: String): DataFrame = {
    val day = datediff(col("o_orderdate").cast("date"), lit("1970-01-01").cast("date"))
      .cast("long")
    Tables.orders(s, dir).filter(col("o_custkey") < 100)
      .withColumn("d", day)
      .withColumn("n_recent", count(lit(1)).over(
        Window.partitionBy(col("o_custkey")).orderBy(col("d")).rangeBetween(-30, 0)))
      .select(col("o_custkey"), col("o_orderkey"), col("n_recent"))
  }

  /** Z-order layout quality: orders keyed by the Morton interleave of
    * (customer bucket, day bucket) and grouped by z-range — per
    * z-bucket min/max on BOTH dimensions are the parquet footer stats a
    * scan would prune on, and under z-order every bucket covers a tight
    * RECTANGLE in (customer, day) where a single-column sort leaves the
    * second dimension's ranges spanning everything
    * ([[graft.operators.Layout]]). Pure integer bit arithmetic — the
    * oracle replays the interleave verbatim.
    */
  def zorderLayoutStats(s: SparkSession, dir: String): DataFrame = {
    val day = datediff(col("o_orderdate").cast("date"), lit("1970-01-01").cast("date"))
      .cast("long")
    Tables.orders(s, dir)
      .withColumn("a", pmod(col("o_custkey"), lit(4096L)))
      .withColumn("b", pmod(day, lit(4096L)))
      .withColumn("zbucket", shiftrightunsigned(
        graft.operators.Layout.zOrderKey(col("a"), col("b"), 12), 16))
      .groupBy(col("zbucket"))
      .agg(count(lit(1)).as("n_orders"),
           min(col("a")).as("min_cust"), max(col("a")).as("max_cust"),
           min(col("b")).as("min_day"), max(col("b")).as("max_day"))
  }

  /** percent_rank / cume_dist distribution metrics per market segment —
    * the remaining analytic-window functions (row_number/rank: q05,
    * frames: q35/q68, lag: q57, ntile: q66). Both are deterministic
    * under ties by definition (value-based), and the averages go through
    * the exact-decimal path.
    */
  def rankMetrics(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("c_acctbal"))
    Tables.customer(s, dir)
      .withColumn("pr", percent_rank().over(w))
      .withColumn("cd", cume_dist().over(w))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
           davg(col("pr")).as("avg_percent_rank"),
           davg(col("cd")).as("avg_cume_dist"))
  }

  /** Structured extraction from semi-structured strings: regexp_extract
    * pulls the numeric id out of the name and cross-checks it against
    * the key column — the scrub/validate scan run before trusting a
    * denormalized text field. Patterns stay in the Java∩RE2 subset
    * (digits/literals) so both engines match identically.
    */
  def regexExtractAudit(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .withColumn("name_id",
        regexp_extract(col("c_name"), "Customer#(\\d+)", 1).cast("long"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
           count(when(col("name_id") === col("c_custkey"), 1)).as("n_consistent"),
           sum(col("name_id")).as("sum_ids"))

  /** FIRST_VALUE / LAST_VALUE over a full-partition frame: each
    * customer's first and last order (by date, keyed tie-break) —
    * completes the analytic-window inventory (rank q05, frames q35/q68,
    * lag q57, ntile q66, distribution q70). The unbounded-following
    * frame is the part worth pinning: the default frame stops at
    * CURRENT ROW, where last_value degenerates to the row itself.
    */
  def firstLastOrders(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(s, dir).filter(col("o_custkey") < 200)
      .withColumn("first_order", first(col("o_orderkey")).over(w))
      .withColumn("last_order", last(col("o_orderkey")).over(w))
      .select(col("o_custkey"), col("first_order"), col("last_order"))
      .distinct()
  }

  /** INTERSECT ALL / EXCEPT ALL — the multiset (duplicate-preserving)
    * set operations; q34 covers the DISTINCT forms. Counting the
    * surviving multiplicities per nation makes duplicate preservation
    * the thing the oracle actually checks.
    */
  def setOpsAll(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).select(col("c_nationkey").as("nationkey"))
    val sup = Tables.supplier(s, dir).select(col("s_nationkey").as("nationkey"))
    c.intersectAll(sup).groupBy(col("nationkey"))
      .agg(count(lit(1)).as("n")).withColumn("tag", lit("intersect_all"))
      .unionByName(
        c.exceptAll(sup).groupBy(col("nationkey"))
          .agg(count(lit(1)).as("n")).withColumn("tag", lit("except_all")))
  }

  /** CDC table maintenance over the orders log — [[graft.operators.Cdc]]
    * end to end: orders replay as a per-customer update stream (key =
    * o_custkey, version = o_orderdate, tie-break = o_orderkey;
    * finalized orders with key ≡ 0 mod 9 synthesize deterministic
    * tombstones), from which the query derives BOTH maintained forms —
    * the SCD-type-2 history (validity intervals: n_versions / n_closed
    * per key) and the latest-wins compacted snapshot (current price /
    * status / valid-from; a key whose newest change is a delete is
    * absent ⇒ is_deleted). An older delete followed by a newer upsert
    * resurrects the key — the MERGE semantics the oracle replays.
    *
    * Scale shape: both forms are ONE shuffle on the key (window per
    * key); the custkey slice commutes with the per-key windows (it
    * filters whole partitions), so it applies at the scan — at 100 TB
    * the same plan runs unsliced over a bucketed log as a zero-shuffle
    * per-bucket sort, which is exactly Delta/Iceberg MERGE compaction.
    */
  def scd2Orders(s: SparkSession, dir: String): DataFrame = {
    val log = Tables.orders(s, dir)
      .filter(col("o_custkey") % 100 === 0) // commutes with per-key windows
      .withColumn("op",
        when(col("o_orderstatus") === "F" && col("o_orderkey") % 9 === 0, "D")
          .otherwise("U"))
    val hist = graft.operators.Cdc.scd2(
      log, Seq("o_custkey"), col("o_orderdate"), col("o_orderkey"))
      .groupBy(col("o_custkey").as("custkey"))
      .agg(count(lit(1)).as("n_versions"),
           count(col("valid_to")).as("n_closed"))
    val snap = graft.operators.Cdc.applyChanges(
      log, Seq("o_custkey"), col("o_orderdate"), col("o_orderkey"), col("op"))
      .select(col("o_custkey").as("custkey"),
        col("o_totalprice").as("cur_price"),
        col("o_orderstatus").as("cur_status"),
        unix_timestamp(col("o_orderdate")).as("cur_from"))
    hist.join(snap, Seq("custkey"), "left")
      .withColumn("is_deleted", col("cur_from").isNull)
      .select(col("custkey"), col("n_versions"), col("n_closed"),
        col("cur_price"), col("cur_status"), col("cur_from"), col("is_deleted"))
  }

  /** Small-file compaction planning (q133) — bin-pack a deterministic
    * file manifest synthesized from lineitem: one "file" per
    * (returnflag+linestatus partition, orderkey div 256), sized by its
    * quantity mass in 4 KiB pages, with every 32nd file inflated 40× so
    * both planner paths (keep vs compact) are exercised at every scale
    * factor. The plan itself ([[graft.operators.Compaction.plan]]) is a
    * single window + rollup over the manifest — metadata-sized work no
    * matter how large the table the manifest describes.
    */
  def compactionPlan(s: SparkSession, dir: String): DataFrame = {
    val manifest = Tables.lineitem(s, dir)
      .select(
        concat(col("l_returnflag"), col("l_linestatus")).as("part_key"),
        floor(col("l_orderkey") / lit(256.0)).cast("long").as("file_id"),
        col("l_quantity"))
      .groupBy(col("part_key"), col("file_id"))
      .agg((sum(col("l_quantity").cast("long")) * lit(4096L) *
        when(col("file_id") % 32 === 0, lit(40L)).otherwise(lit(1L)))
        .as("size_bytes"))
    graft.operators.Compaction.plan(manifest, targetBytes = 64L << 20)
  }

  private[queries] def relationalOracles: Map[String, String] = Map(
    "q133_compaction_plan" ->
      """WITH m0 AS (
        | SELECT l_returnflag || l_linestatus AS part_key,
        |  CAST(FLOOR(l_orderkey / 256.0) AS BIGINT) AS file_id,
        |  CAST(l_quantity AS BIGINT) AS q
        | FROM lineitem),
        |m AS (
        | SELECT part_key, file_id,
        |  CAST(SUM(q) * 4096 *
        |   (CASE WHEN file_id % 32 = 0 THEN 40 ELSE 1 END) AS BIGINT) AS size_bytes
        | FROM m0 GROUP BY part_key, file_id),
        |k AS (
        | SELECT part_key, 'keep' AS kind, file_id AS bin_id,
        |  CAST(1 AS BIGINT) AS n_files, size_bytes AS bin_bytes,
        |  file_id AS first_file, file_id AS last_file
        | FROM m WHERE size_bytes >= 67108864),
        |c0 AS (
        | SELECT part_key, file_id, size_bytes,
        |  SUM(size_bytes) OVER (PARTITION BY part_key
        |    ORDER BY size_bytes DESC, file_id ROWS UNBOUNDED PRECEDING) AS cum
        | FROM m WHERE size_bytes < 67108864),
        |c AS (
        | SELECT part_key, 'compact' AS kind,
        |  CAST(FLOOR(CAST(cum - size_bytes AS DOUBLE) / 67108864) AS BIGINT) AS bin_id,
        |  COUNT(*) AS n_files, CAST(SUM(size_bytes) AS BIGINT) AS bin_bytes,
        |  MIN(file_id) AS first_file, MAX(file_id) AS last_file
        | FROM c0 GROUP BY part_key, bin_id)
        |SELECT * FROM k UNION ALL SELECT * FROM c""".stripMargin,
    "q125_scd2" ->
      s"""WITH u AS (SELECT o_custkey AS k, o_orderdate AS v,
         |  o_orderkey AS tk, o_totalprice AS price, o_orderstatus AS status,
         |  CASE WHEN o_orderstatus = 'F' AND o_orderkey % 9 = 0
         |       THEN 'D' ELSE 'U' END AS op
         | FROM orders WHERE o_custkey % 100 = 0),
         |h AS (SELECT *, LEAD(v) OVER (PARTITION BY k ORDER BY v, tk)
         |      AS valid_to FROM u),
         |agg AS (SELECT k, COUNT(*) AS n_versions,
         |        COUNT(valid_to) AS n_closed FROM h GROUP BY k),
         |newest AS (SELECT * FROM (SELECT *, ROW_NUMBER() OVER
         |  (PARTITION BY k ORDER BY v DESC, tk DESC) AS rn FROM u)
         |  WHERE rn = 1),
         |snap AS (SELECT k, price, status, v FROM newest WHERE op <> 'D')
         |SELECT agg.k AS custkey, agg.n_versions, agg.n_closed,
         | snap.price AS cur_price, snap.status AS cur_status,
         | CAST(epoch(snap.v) AS BIGINT) AS cur_from,
         | snap.k IS NULL AS is_deleted
         |FROM agg LEFT JOIN snap ON agg.k = snap.k""".stripMargin,
    "q01_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         | ${dsumSql("l_quantity")} AS sum_qty,
         | ${dsumSql("l_extendedprice")} AS sum_base_price,
         | ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
         | ${davgSql("l_quantity")} AS avg_qty,
         | COUNT(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '$ShipCutoff 00:00:00'
         |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q02_region_revenue" ->
      s"""SELECT r_name, ${dsumSql("o_totalprice")} AS revenue, COUNT(*) AS n_orders
         |FROM orders
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name""".stripMargin,
    "q03_join_priority" ->
      s"""SELECT o_orderpriority,
         | COUNT(DISTINCT l_orderkey) AS n_orders,
         | ${dsumSql("l_extendedprice")} AS sum_price
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY o_orderpriority""".stripMargin,
    "q04_topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q05_window_rank" ->
      """SELECT o_custkey, o_orderkey, rank FROM (
        | SELECT o_custkey, o_orderkey,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rank
        | FROM orders) t WHERE rank <= 3""".stripMargin,
    "q06_anti_join" ->
      """SELECT c_mktsegment, COUNT(*) AS n_customers FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
        |GROUP BY c_mktsegment""".stripMargin,
    "q07_semi_join" ->
      """SELECT c_nationkey, COUNT(*) AS n_customers FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |GROUP BY c_nationkey""".stripMargin,
    "q08_distinct_agg" ->
      """SELECT l_returnflag,
        | COUNT(DISTINCT l_suppkey) AS n_suppliers,
        | COUNT(DISTINCT l_partkey) AS n_parts
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q09_union_nations" ->
      """SELECT DISTINCT nationkey FROM (
        | SELECT c_nationkey AS nationkey FROM customer
        | UNION ALL SELECT s_nationkey FROM supplier) t""".stripMargin,
    "q33_rollup" ->
      s"""SELECT l_returnflag, l_linestatus,
         | ${dsumSql("l_quantity")} AS sum_qty, COUNT(*) AS n
         |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,
    "q34_setops" ->
      """SELECT nationkey, 'both' AS tag FROM (
        | SELECT DISTINCT c_nationkey AS nationkey FROM customer
        | INTERSECT SELECT DISTINCT s_nationkey FROM supplier) a
        |UNION ALL
        |SELECT nationkey, 'customers_only' AS tag FROM (
        | SELECT DISTINCT c_nationkey AS nationkey FROM customer
        | EXCEPT SELECT DISTINCT s_nationkey FROM supplier) b""".stripMargin,
    "q35_running_total" ->
      """SELECT o_custkey, o_orderkey,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) OVER (
        |   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
        |FROM orders WHERE o_custkey < 100""".stripMargin,
    "q36_above_avg" ->
      s"""SELECT c_nationkey, COUNT(*) AS n_above FROM customer
         |WHERE c_acctbal > (SELECT ${davgSql("c_acctbal")} FROM customer)
         |GROUP BY c_nationkey""".stripMargin,
    // IVF replay: per-label mean centroids, rank cells by query-centroid
    // cosine (label tie-break), exact search inside the top-3 cells,
    "q39_percentiles" ->
      """SELECT l_returnflag,
        | quantile_cont(l_quantity, 0.5) AS p50_qty,
        | quantile_cont(l_quantity, 0.95) AS p95_qty,
        | COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q40_price_histogram" ->
      s"""SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bucket,
         | COUNT(*) AS n, ${dsumSql("o_totalprice")} AS bucket_total
         |FROM orders GROUP BY 1""".stripMargin,
    "q44_cube" ->
      s"""SELECT l_returnflag, l_linestatus,
         | ${dsumSql("l_quantity")} AS sum_qty, COUNT(*) AS n
         |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,
    "q48_grouping_sets" ->
      s"""SELECT l_returnflag, l_linestatus,
         | ${dsumSql("l_quantity")} AS sum_qty, COUNT(*) AS n
         |FROM lineitem
         |GROUP BY GROUPING SETS ((l_returnflag), (l_returnflag, l_linestatus), ())""".stripMargin,
    "q58_above_own_avg" ->
      """SELECT o_orderpriority, COUNT(*) AS n_above,
        | COUNT(DISTINCT o_custkey) AS n_customers
        |FROM orders o1
        |WHERE CAST(o_totalprice AS DECIMAL(20,6))
        |    * CAST((SELECT COUNT(*) FROM orders o2
        |            WHERE o2.o_custkey = o1.o_custkey) AS DECIMAL(8,0))
        |    > (SELECT SUM(CAST(o_totalprice AS DECIMAL(20,6))) FROM orders o3
        |       WHERE o3.o_custkey = o1.o_custkey)
        |GROUP BY o_orderpriority""".stripMargin,
    "q59_mode" ->
      """WITH c AS (
        | SELECT l_returnflag, l_quantity, COUNT(*) AS c
        | FROM lineitem GROUP BY l_returnflag, l_quantity)
        |SELECT l_returnflag, l_quantity AS mode_qty, c AS mode_n FROM (
        | SELECT l_returnflag, l_quantity, c,
        |  ROW_NUMBER() OVER (PARTITION BY l_returnflag
        |    ORDER BY c DESC, l_quantity) AS rn
        | FROM c) t WHERE rn = 1""".stripMargin,
    "q62_full_outer" ->
      """WITH c AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer
        |           WHERE c_mktsegment = 'MACHINERY' GROUP BY 1),
        |s AS (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier
        |      WHERE s_acctbal > 9000 GROUP BY 1)
        |SELECT COALESCE(c.nk, s.nk) AS nationkey,
        | COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
        |FROM c FULL JOIN s ON c.nk = s.nk""".stripMargin,
    "q66_ntile_quartiles" ->
      s"""WITH q AS (
         | SELECT c_mktsegment, c_acctbal,
         |  CAST(NTILE(4) OVER (PARTITION BY c_mktsegment
         |    ORDER BY c_acctbal, c_custkey) AS INT) AS quartile
         | FROM customer)
         |SELECT c_mktsegment, quartile, COUNT(*) AS n,
         | ${davgSql("c_acctbal")} AS avg_bal
         |FROM q GROUP BY 1, 2""".stripMargin,
    "q67_monthly_orders" ->
      s"""SELECT CAST(EXTRACT(year FROM o_orderdate) * 100
         |   + EXTRACT(month FROM o_orderdate) AS INT) AS ym,
         | COUNT(*) AS n_orders, ${dsumSql("o_totalprice")} AS revenue
         |FROM orders GROUP BY 1""".stripMargin,
    "q68_trailing_window" ->
      """WITH o AS (
        | SELECT o_custkey, o_orderkey,
        |  CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS d
        | FROM orders WHERE o_custkey < 100)
        |SELECT o_custkey, o_orderkey,
        | COUNT(*) OVER (PARTITION BY o_custkey ORDER BY d
        |   RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS n_recent
        |FROM o""".stripMargin,
    "q106_zorder" ->
      """WITH o AS (
        | SELECT o_custkey % 4096 AS a,
        |  CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) % 4096 AS b
        | FROM orders),
        |z AS (SELECT a, b,
        |  CAST(list_sum(list_transform(range(0, 12), i ->
        |    (((a >> i) & 1) << (2*i)) + (((b >> i) & 1) << (2*i + 1))))
        |   AS BIGINT) >> 16 AS zbucket
        | FROM o)
        |SELECT zbucket, COUNT(*) AS n_orders,
        | MIN(a) AS min_cust, MAX(a) AS max_cust,
        | MIN(b) AS min_day, MAX(b) AS max_day
        |FROM z GROUP BY zbucket""".stripMargin,
    "q70_rank_metrics" ->
      s"""WITH r AS (
         | SELECT c_mktsegment,
         |  percent_rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal) AS pr,
         |  cume_dist() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal) AS cd
         | FROM customer)
         |SELECT c_mktsegment, COUNT(*) AS n,
         | ${davgSql("pr")} AS avg_percent_rank,
         | ${davgSql("cd")} AS avg_cume_dist
         |FROM r GROUP BY c_mktsegment""".stripMargin,
    "q74_regex_extract" ->
      """WITH x AS (
        | SELECT c_mktsegment, c_custkey,
        |  CAST(regexp_extract(c_name, 'Customer#(\d+)', 1) AS BIGINT) AS name_id
        | FROM customer)
        |SELECT c_mktsegment, COUNT(*) AS n,
        | COUNT(CASE WHEN name_id = c_custkey THEN 1 END) AS n_consistent,
        | CAST(SUM(name_id) AS BIGINT) AS sum_ids
        |FROM x GROUP BY c_mktsegment""".stripMargin,
    "q75_first_last" ->
      """SELECT DISTINCT o_custkey,
        | FIRST_VALUE(o_orderkey) OVER w AS first_order,
        | LAST_VALUE(o_orderkey) OVER w AS last_order
        |FROM orders WHERE o_custkey < 200
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin,
    "q77_setops_all" ->
      """WITH i AS (
        | SELECT nationkey FROM (SELECT c_nationkey AS nationkey FROM customer)
        | INTERSECT ALL SELECT s_nationkey FROM supplier),
        |e AS (
        | SELECT nationkey FROM (SELECT c_nationkey AS nationkey FROM customer)
        | EXCEPT ALL SELECT s_nationkey FROM supplier)
        |SELECT nationkey, n, tag FROM (
        | SELECT nationkey, COUNT(*) AS n, 'intersect_all' AS tag FROM i GROUP BY 1
        | UNION ALL
        | SELECT nationkey, COUNT(*) AS n, 'except_all' AS tag FROM e GROUP BY 1) t""".stripMargin,
  )
}
