package graft.queries

import graft.Tables
import graft.functions.{ExactNum, TextFunctions, VectorFunctions}
import graft.operators.{Dedup, Sessionize, Similarity, WindowedAgg}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The engine's query inventory, one entry per operator family from
  * SURVEY.md §2 plus the training-data extensions. EVERY query has a
  * DuckDB oracle in [[oracles]]: signature operators hash with
  * cross-engine-reproducible FNV arithmetic, and even the multi-probe
  * ANN family (q24/q28/q38) — approximate relative to brute force but
  * fully deterministic — is replayed exactly in SQL from the embedded
  * splitmix64 hyperplane-weight matrix / centroid arithmetic.
  *
  * Determinism contract with the oracle:
  *  - double aggregates go through [[ExactNum]] (exact decimal sums);
  *  - top-k / window ranks always carry a unique tie-break key;
  *  - window starts are emitted as epoch-second BIGINTs (no tz ambiguity).
  */
object QueryPack {
  import ExactNum._

  type Q = (SparkSession, String) => DataFrame

  // ---------------------------------------------------------------- helpers
  private val ShipCutoff = "1998-09-02"

  // ---- DuckDB twins of the native text-hash expressions --------------
  // (org.apache.spark.sql.graft.TextHashOps — FNV-1a over codepoints with
  // hugeint modular arithmetic, so signature queries get full hash
  // oracles instead of rows-only checks.)

  /** Whitespace tokens with the empty-string guard (mirrors
    * TextFunctions.tokens: "" → [], not ['']). */
  private def toksSql(x: String): String =
    s"""CASE WHEN length(trim($x)) = 0 THEN CAST([] AS VARCHAR[])
       | ELSE regexp_split_to_array(trim($x), '\\s+') END""".stripMargin.replace("\n", " ")

  /** FNV-1a 64-bit over codepoints of `t`, as UBIGINT. */
  private def fnvSql(t: String): String =
    s"""CAST(list_reduce(list_prepend(CAST(14695981039346656037 AS HUGEINT),
       |  list_transform(range(1, length($t)+1), i -> CAST(unicode(substr($t, i, 1)) AS HUGEINT))),
       |  (acc, c) -> (CAST(xor(CAST(acc AS UBIGINT), CAST(c AS UBIGINT)) AS HUGEINT)
       |               * 1099511628211) % 18446744073709551616) AS UBIGINT)""".stripMargin
      .replace("\n", " ")

  /** Rolling rotate-xor combine of a UBIGINT hash list (mirrors
    * TextFunctions.fingerprint: acc' = rotl5(acc) xor h, init 0). */
  private def rollSql(hashes: String): String =
    s"""CAST(list_reduce(list_prepend(CAST(0 AS UBIGINT), $hashes),
       |  (acc, h) -> xor(CAST(((CAST(acc AS HUGEINT) * 32) % 18446744073709551616) AS UBIGINT)
       |                  | (acc >> 59), h)) AS UBIGINT)""".stripMargin.replace("\n", " ")

  /** UBIGINT → two's-complement BIGINT (Spark longs are signed). */
  private def signedSql(x: String): String =
    s"""CAST(CAST($x AS HUGEINT) -
       | CASE WHEN $x >= 9223372036854775808 THEN CAST(18446744073709551616 AS HUGEINT)
       |      ELSE 0 END AS BIGINT)""".stripMargin.replace("\n", " ")

  /** Per-doc SimHash vote CTEs over `documents` (shared by q21/q32):
    * yields relation `sv(doc_id, c0..c63)` of per-bit vote sums; docs
    * with zero tokens are absent (callers COALESCE the signature to 0,
    * matching simhash64([]) = 0).
    */
  private val simhashVotesSql: String = {
    val votes = (0 until 64).map(b =>
      s"SUM(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS c$b").mkString(", ")
    s"""th AS (SELECT doc_id, list_transform(${toksSql("text")}, t -> ${fnvSql("t")}) AS hs
       |  FROM documents),
       |u AS (SELECT doc_id, unnest(hs) AS h FROM th),
       |sv AS (SELECT doc_id, $votes FROM u GROUP BY doc_id)""".stripMargin
  }

  /** Packs sv's 64 vote sums into an UBIGINT signature. */
  private val simhashUnsignedPackSql: String =
    "CAST((CAST(0 AS HUGEINT)" +
      (0 until 64).map(b =>
        s" + (CASE WHEN c$b > 0 THEN CAST('${java.lang.Long.toUnsignedString(1L << b)}' AS HUGEINT) ELSE 0 END)")
        .mkString + ") AS UBIGINT)"

  // ---- DuckDB twins of the hyperplane-LSH bucketing ------------------
  // (org.apache.spark.sql.graft.VectorHashOps — weights regenerate from
  // splitmix64(dim, plane), so the EXACT weight matrix embeds here as
  // double literals; Double.toString round-trips through DuckDB's
  // decimal parser bit-for-bit. Only projection SIGNS feed the bucket
  // bits, and the smallest |projection| on the test corpora is ~1e-5 —
  // ten orders of magnitude above cross-engine summation noise — so the
  // replay is exact (AnnOracleMarginSpec pins that margin).)

  /** 64-dim weight row of hyperplane `plane` as a DuckDB double-list literal. */
  private def planeWeightsSql(plane: Int): String =
    "[" + (0 until 64).map(d =>
      org.apache.spark.sql.graft.VectorHashOps.weight(d, plane)).mkString(",") + "]"

  /** Packed bucket id of table `table` (MSB-first over its planes) for a
    * DOUBLE[] column `emb` — mirrors VectorHashOps.buckets. */
  private def bucketSql(emb: String, table: Int, nPlanes: Int): String =
    (0 until nPlanes).map { i =>
      val bit = 1L << (nPlanes - 1 - i)
      s"(CASE WHEN list_dot_product($emb, ${planeWeightsSql(table * nPlanes + i)}) >= 0 THEN $bit ELSE 0 END)"
    }.mkString(" + ")

  /** Multi-probe collision predicate between bucket columns `a`/`b`:
    * single-bit probes ⇒ candidate iff hamming ≤ 1 in SOME table. */
  private def anyTableCollidesSql(a: String, b: String, nTables: Int): String =
    (0 until nTables).map(t =>
      s"bit_count(xor($a$t, $b$t)) <= 1").mkString("(", " OR ", ")")

  // ------------------------------------------------------------- relational

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

  // --------------------------------------------------- events (telemetry)

  /** The reference's core operator: 5-minute tumbling window + dims →
    * multi-SUM (ErrorAggregatorBase.scala:238-255), window emitted as
    * epoch seconds.
    */
  def eventWindowSum(s: SparkSession, dir: String): DataFrame =
    WindowedAgg.tumbling(
      Tables.events(s, dir), "ts", "5 minutes", "1 minute",
      Seq(col("event_type")),
      Seq(dsum(col("value")).as("sum_value"), count(lit(1)).as("n_events")))
      .select(col("window_start").cast("long").as("window_start"),
        col("event_type"), col("sum_value"), col("n_events"))

  /** Conditional windowed counts — ExperimentEnrollmentsAggregator's
    * count(when(method==…)) pattern
    * (ExperimentEnrollmentsAggregator.scala:136-143), hourly.
    */
  def eventConditionalWindow(s: SparkSession, dir: String): DataFrame =
    WindowedAgg.tumbling(
      Tables.events(s, dir), "ts", "1 hour", "1 minute", Seq.empty,
      Seq(count(when(col("event_type") === "signup", 1)).as("n_signup"),
          count(when(col("event_type") === "error", 1)).as("n_error"),
          count(when(col("event_type") === "purchase", 1)).as("n_purchase")))
      .select(col("window_start").cast("long").as("window_start"),
        col("n_signup"), col("n_error"), col("n_purchase"))

  /** JSON payload field extraction — the reference's json4s `\` walks
    * (MainPing.scala:23-101) as codegen'd get_json_object.
    */
  def eventJsonExtract(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"),
           (sum(col("k")).cast("double") / count(lit(1))).as("avg_k"),
           count(lit(1)).as("n"))

  def sessionize(s: SparkSession, dir: String): DataFrame =
    Sessionize.sessionCounts(Tables.events(s, dir), "user_id", "ts", 1800L)

  /** Structured-Streaming-native session windows (gap-merged), batch
    * form; oracle replicates the merge with a lag/gap running sum.
    */
  def sessionWindows(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").cast("long").as("session_start"),
        col("n_events"))

  /** As-of join: each event picks the most recent order (max order key on
    * ties) of the same user on or before the event's day. Spark lacks a
    * native as-of operator; the scale-correct composition is
    * union-the-streams → one window pass per key (`last` ignoreNulls over
    * the time-ordered union) — a single shuffle on the key, no range-join
    * explosion, no per-event subquery. Day arithmetic stays on epoch
    * integers so both engines agree without timezone coupling.
    */
  def asofLatestOrder(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).filter(col("user_id") < 20)
      .select(col("user_id").as("key"),
        (col("ts").cast("long") / lit(86400L)).cast("long").as("d"),
        col("ts").cast("long").as("ts_s"),
        lit(0).as("is_order"), lit(null).cast("long").as("okey"))
    // the order side prunes to the event-side key range BEFORE the
    // shuffle — the window must not scan orders no event can reach
    val od = Tables.orders(s, dir).filter(col("o_custkey") < 20)
      .select(col("o_custkey").as("key"),
        // o_orderdate is TIMESTAMP_NTZ: day number via date difference
        // (no epoch cast exists for NTZ, and this stays timezone-free)
        datediff(col("o_orderdate").cast("date"), lit("1970-01-01").cast("date"))
          .cast("long").as("d"),
        col("o_orderkey"))
      .groupBy(col("key"), col("d"))
      .agg(max(col("o_orderkey")).as("okey"))
      .select(col("key"), col("d"), lit(null).cast("long").as("ts_s"),
        lit(1).as("is_order"), col("okey"))
    // same-day orders sort before events (is_order desc), ties among
    // same-day orders resolve to the max key (okey asc + last())
    val w = Window.partitionBy(col("key"))
      .orderBy(col("d").asc, col("is_order").desc, col("okey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.unionByName(od)
      .withColumn("asof_okey", last(col("okey"), ignoreNulls = true).over(w))
      .filter(col("is_order") === 0)
      .select(col("key").as("user_id"), col("ts_s"), col("asof_okey").as("okey"))
  }

  /** Pivot: per-user event counts spread across one column per event
    * type. Values are DECLARED (no driver-side distinct scan to discover
    * them), so the plan is a plain two-phase aggregate.
    */
  def eventTypePivot(s: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    Tables.events(s, dir)
      .groupBy(col("user_id"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .na.fill(0L, types)
  }

  def eventTopUsers(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(dsum(col("value")).as("total_value"), count(lit(1)).as("n_events"))
      .orderBy(col("total_value").desc, col("user_id").asc)
      .limit(20)

  // ----------------------------------------------------- documents (text)

  def dedupExact(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
           countDistinct(md5(col("text"))).as("n_unique"))

  def tokenStats(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("n_tokens", TextFunctions.tokenCount(col("text")).cast("long"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n_tokens")).as("total_tokens"),
           sum(col("n_chars")).as("total_chars"))

  def qualityStats(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("punct_ratio", TextFunctions.punctRatio(col("text")))
      .withColumn("stop_ratio", TextFunctions.stopwordRatio(col("text")))
      .groupBy(col("lang"))
      .agg(davg(col("punct_ratio")).as("avg_punct_ratio"),
           davg(col("stop_ratio")).as("avg_stop_ratio"),
           count(lit(1)).as("n_docs"))

  def langId(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("predicted", TextFunctions.langIdMarkers(col("text")))
      .groupBy(col("lang"), col("predicted"))
      .agg(count(lit(1)).as("n"))

  /** Rolling FNV fingerprint — oracle restates the hash arithmetic. */
  def fingerprints(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), TextFunctions.fingerprint(col("text")).as("fingerprint"),
        TextFunctions.subwordCount(col("text")).as("n_subwords"))

  /** MinHash+LSH near-dup pairs (2-gram shingles; 16 bands × 4 rows).
    * Every emitted pair carries an EXACT verified Jaccard, so the oracle
    * is the exact all-pairs Jaccard at the same threshold. The banding
    * dial is set from the corpus's measured similarity structure —
    * bimodal: background J < 0.1, planted near-dups J ≥ 0.9, nothing
    * between. r=4 keeps background candidates ≈ N²·J⁴ negligible (r ≤ 2
    * measured 25-90× slower here: J≈0.05 pairs × N² swamp the verify
    * join), and 16 bands put the planted-pair miss probability at
    * (1−0.9⁴)¹⁶ ≈ 4·10⁻⁸ — the equality oracle holds across corpus
    * regenerations, not just for this seed.
    */
  def minhashPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.nearDuplicatePairs(Tables.documents(s, dir), "doc_id", "text",
      numHashes = 64, bands = 16, shingleSize = 2, jaccardThreshold = 0.7)

  /** SimHash signatures — FNV token hashes, so the 64-bit majority vote
    * is restated verbatim in the oracle SQL. */
  def simhashSignatures(s: SparkSession, dir: String): DataFrame =
    Dedup.simHash(Tables.documents(s, dir), "text")
      .select(col("doc_id"), col("simhash"))

  /** Exact n-gram Jaccard near-dups via the inverted-index join — the
    * oracle-checkable twin of the LSH path, bounded to a deterministic
    * id slice so the quadratic tail stays capped at bench scale.
    */
  def jaccardPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.exactJaccardPairs(
      Tables.documents(s, dir).filter(col("doc_id") < 1000),
      "doc_id", "text", shingleSize = 2, threshold = 0.5)

  /** Near-dup pairs → duplicate CLUSTERS: connected components assign
    * every member the minimum reachable doc id as `cluster_id` — the
    * keep-one-per-cluster step of a real dedup pipeline. Oracle is a
    * recursive-CTE transitive closure over the identical pair set.
    */
  def dupClusters(s: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.exactJaccardPairs(
      Tables.documents(s, dir).filter(col("doc_id") < 1000),
      "doc_id", "text", shingleSize = 2, threshold = 0.5)
    Dedup.connectedComponents(pairs, "id_a", "id_b")
      .select(col("node").as("doc_id"), col("cluster_id"))
  }

  /** Deterministic train/valid/test split: the FNV hash of the content
    * (not a random()) buckets each document, so the split is reproducible
    * across runs, engines, and repartitioning — the property a training
    * pipeline needs for consistent held-out sets. 80/10/10 over
    * hash mod 100.
    */
  def hashSplit(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graft.TextHashExpressions
    val bucket = TextHashExpressions.fnv64(col("text"))
      .bitwiseAND(lit(0x7FFFFFFFL)) % 100
    Tables.documents(s, dir)
      .withColumn("split",
        when(bucket < 80, "train").when(bucket < 90, "valid").otherwise("test"))
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
  }

  /** Per-language salient terms: tf × smoothed reciprocal document
    * frequency, top-5 per language. The idf is the LOG-FREE rational form
    * (n+1)/(df+1) — identical IEEE arithmetic in both engines, so the
    * oracle hashes exactly (ln() is libm-dependent). Ranking orders by the
    * ROUNDED score with the term as tie-break, keeping rank assignment
    * engine-independent.
    */
  def tfidfTerms(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val toks = docs.select(col("doc_id"), col("lang"),
      explode(TextFunctions.tokens(col("text"))).as("term"))
    val dfreq = toks.select(col("doc_id"), col("term")).distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    val tf = toks.groupBy(col("lang"), col("term")).agg(count(lit(1)).as("tf"))
    val nTotal = docs.agg(count(lit(1)).as("n_total"))
    val scored = tf.join(dfreq, "term")
      .crossJoin(broadcast(nTotal))
      .withColumn("score",
        round(col("tf") * (col("n_total") + lit(1.0)) / (col("df") + lit(1.0)), 6))
    val w = Window.partitionBy(col("lang")).orderBy(col("score").desc, col("term").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("lang"), col("term"), col("score"), col("rank"))
  }

  /** GROUPING SETS — the explicit-subset sibling of ROLLUP/CUBE, via the
    * Spark 4 `groupingSets` Dataset API. */
  def groupingSetsSummary(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_returnflag"), col("l_linestatus")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))

  /** Normalize-then-dedup: lowercase, punctuation→space, collapsed
    * whitespace — the canonicalization pass that catches trivially-edited
    * duplicates exact hashing misses.
    */
  def normalizedDedup(s: SparkSession, dir: String): DataFrame = {
    // one native pass collapses punct/ws runs; lower() stays the engine
    // built-in so Unicode case folding matches the oracle's lower()
    val norm = lower(
      org.apache.spark.sql.graft.TextNormExpressions.normalizeWsPunct(col("text")))
    Tables.documents(s, dir)
      .withColumn("norm_hash", md5(norm))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
           countDistinct(col("norm_hash")).as("n_unique_normalized"))
  }

  /** Bucketed range join (big-big, self): for every error event, the
    * count of same-user events in the following hour — incident
    * correlation. The bucket trick turns the non-equi time predicate
    * into an equi-join on (user, hour-bucket) — see
    * [[graft.operators.RangeJoin]]; the oracle states the naive
    * inequality join.
    */
  def rangeJoinEvents(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("ts").cast("long").as("ts_s"))
    val points = base.select(col("user_id"), col("ts_s"))
    val anchors = base.filter(col("event_type") === "error")
      .select(col("user_id").as("a_user"), col("ts_s").as("a_start"))
      .withColumn("a_end", col("a_start") + 3600L)
    graft.operators.RangeJoin.pointInInterval(
        points, "user_id", "ts_s", anchors, "a_user", "a_start", "a_end",
        bucketWidth = 3600L)
      .groupBy(col("a_user"), col("a_start"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("a_user").as("user_id"), col("a_start").as("anchor_s"),
        col("n_events"))
  }

  /** Deterministic weighted dataset mixing: each source keeps a
    * tier-dependent fraction of its documents, selected by content hash
    * (not random()) so the mix is reproducible across runs, engines, and
    * partitionings — source reweighting, the knob a training pipeline
    * turns to rebalance web/wiki/code proportions.
    */
  def weightedMix(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graft.TextHashExpressions
    val tier = substring(col("source"), 4, 10).cast("int") % 4
    val threshold = when(tier === 0, 1000L).when(tier === 1, 500L)
      .when(tier === 2, 250L).otherwise(100L)
    val bucket = TextHashExpressions.fnv64(col("text"))
      .bitwiseAND(lit(0x7FFFFFFFL)) % 1000
    Tables.documents(s, dir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_total"),
           count(when(bucket < threshold, 1)).as("n_kept"))
  }

  /** Sliding (overlapping) event-time windows — 10-minute windows every
    * 5 minutes, so each event lands in two windows. The reference uses
    * only tumbling windows; this exercises Spark's sliding `window()`
    * (the oracle unrolls the two covering window starts per event).
    */
  def slidingWindowCounts(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .select(col("window.start").cast("long").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** PII / pattern scanning: per source, how many documents contain
    * email-shaped or URL-shaped strings — the redaction-triage scan a
    * curation pipeline runs before release. Patterns stay in the
    * Java∩RE2 regex subset so both engines match identically.
    */
  def piiScan(s: SparkSession, dir: String): DataFrame = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val url = "https?://[A-Za-z0-9./_-]+"
    // the synthetic corpus contains no emails/URLs (those columns gate
    // the pattern plumbing at zero); the long-word column matches most
    // documents, so the oracle check is NOT vacuous for the regex path
    val longWord = "[A-Za-z]{8,}"
    Tables.documents(s, dir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
           count(when(col("text").rlike(email), 1)).as("n_with_email"),
           count(when(col("text").rlike(url), 1)).as("n_with_url"),
           count(when(col("text").rlike(longWord), 1)).as("n_with_longword"))
  }

  /** End-to-end near-dup REMOVAL: cluster near-duplicates (q45's
    * connected components over exact-Jaccard pairs) and keep only the
    * canonical (minimum-id) member of each cluster — the survivor count
    * per language is what a curation pipeline reports after dedup.
    */
  def dedupSurvivors(s: SparkSession, dir: String): DataFrame = {
    // reuses q45's cluster pipeline verbatim — q54 summarizes exactly
    // the clusters q45 reports, and parameter tuning stays in one place
    val dropped = dupClusters(s, dir)
      .filter(col("doc_id") =!= col("cluster_id")) // non-canonical members
      .select(col("doc_id"))
    Tables.documents(s, dir).filter(col("doc_id") < 1000)
      .join(dropped, Seq("doc_id"), "left_anti")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_survivors"))
  }

  // -------------------------------------------------- embeddings (vectors)

  def knnBrute(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding"))
    Similarity.bruteForceTopK(queries, emb, 10)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  /** IVF ANN: label cells as the coarse quantizer. The probe selection
    * is deterministic (centroids are plain per-dim means, ranked with a
    * label tie-break), so the DuckDB oracle replays the exact same
    * cell-probe + in-cell exact search. Output carries ids and ranks
    * only — the ORDERING is the contract; the raw cosine doubles differ
    * across engines by ulps and are checked via the q23 margin analysis.
    */
  def knnIvf(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding"))
    Similarity.ivfTopK(queries, emb, 10, dim = 64, nProbes = 3)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  /** LSH-bucketed ANN. Approximate relative to brute force, but fully
    * DETERMINISTIC: hyperplane weights regenerate from splitmix64(dim,
    * plane), so the candidate set ("collides within hamming ≤ 1 in any
    * table") is replayable — the oracle embeds the same weight matrix as
    * double literals and reproduces candidates + exact re-ranking in
    * SQL. Sign margins are ≥1e-5 vs ~1e-15 FP noise (see
    * AnnOracleMarginSpec), so cross-engine bucket bits are stable.
    */
  def knnLsh(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding"))
    Similarity.lshTopK(queries, emb, 10, nPlanes = 6, nTables = 4)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  def centroidStats(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
           favg(element_at(col("embedding"), 1)).as("avg_d0"),
           favg(element_at(col("embedding"), 2)).as("avg_d1"),
           favg(VectorFunctions.norm(col("embedding"))).as("avg_norm"))

  // ------------------------------------------------------------ multimodal

  /** Multimodal plumbing: binary payload column + typed metadata. The
    * "decode" here is the deterministic stub (byte length + fake dims);
    * real image/audio decoding plugs into [[graft.operators.Media]].
    */
  def mediaMeta(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("blob", col("text").cast("binary"))
      .withColumn("n_bytes", length(col("blob")).cast("long"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_media"), sum(col("n_bytes")).as("total_bytes"))

  /** Exact embedding-cosine near-dup on a bounded slice (oracle twin). */
  def embNearDupExact(s: SparkSession, dir: String): DataFrame =
    graft.operators.Similarity.cosinePairsExact(
      Tables.embeddings(s, dir).filter(col("vec_id") < 300), threshold = 0.4)

  /** LSH-bucketed embedding near-dup. Deterministic approximation: the
    * oracle replays the bucket predicate (hamming ≤ 1 in either table,
    * from the embedded weight matrix) plus the exact cosine threshold.
    */
  def embNearDupLsh(s: SparkSession, dir: String): DataFrame =
    graft.operators.Similarity.cosineNearDupLsh(
      Tables.embeddings(s, dir), threshold = 0.35, nPlanes = 4)
      .select(col("id_a"), col("id_b"))

  /** Multimodal decode: binary blob → typed metadata via mapPartitions
    * (stubbed codec, real plumbing), aggregated per format.
    */
  def mediaDecode(s: SparkSession, dir: String): DataFrame = {
    val media = graft.operators.Media.attachBlob(Tables.documents(s, dir))
    graft.operators.Media.decodeMetadata(media)
      .groupBy(col("format"))
      .agg(count(lit(1)).as("n_media"),
           sum(col("width").cast("long")).as("total_width"),
           sum(col("height").cast("long")).as("total_height"),
           sum(col("n_bytes")).as("total_bytes"))
  }

  /** Frame-sampling stub: explode-shaped row amplification per source.
    * Left join from documents so a zero-frame (empty-blob) doc still
    * counts, matching the oracle's ceil(0/256)=0 row.
    */
  def mediaFrames(s: SparkSession, dir: String): DataFrame = {
    val media = graft.operators.Media.attachBlob(Tables.documents(s, dir))
    val frames = graft.operators.Media.sampleFrames(media, frameBytes = 256)
    val perDoc = frames.groupBy(col("doc_id")).agg(count(lit(1)).as("n_frames"))
    Tables.documents(s, dir).select(col("doc_id"), col("source"))
      .join(perDoc, Seq("doc_id"), "left")
      .withColumn("n_frames", coalesce(col("n_frames"), lit(0L)))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_frames")).as("total_frames"))
  }

  /** SimHash band-LSH near-dup pairs with exact hamming verification.
    * 8×8-bit banding has FULL recall for hamming ≤ 7 (pigeonhole), so the
    * brute-force self-join oracle is exactly equal — the LSH is a pure
    * execution-strategy change, not an approximation, at this distance.
    */
  def simhashNearDups(s: SparkSession, dir: String): DataFrame =
    Dedup.simHashNearDups(Tables.documents(s, dir), "doc_id", "text", maxHamming = 7)

  /** Composite quality scoring (length sweet-spot ⊕ punctuation ⊕
    * stopword balance) + mean word length, aggregated per language — the
    * end-to-end quality-filter feature column a curation pipeline
    * thresholds on.
    */
  def qualityScoreStats(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("q", TextFunctions.qualityScore(col("text")))
      .withColumn("mwl", TextFunctions.meanWordLength(col("text")))
      .groupBy(col("lang"))
      .agg(davg(col("q")).as("avg_quality"),
           davg(col("mwl")).as("avg_word_len"),
           count(lit(1)).as("n_docs"))

  /** BPE-ish subword counting over the raw text, per language. */
  def subwordStats(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("n_subwords", TextFunctions.subwordCount(col("text")).cast("long"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_subwords")).as("total_subwords"))

  /** Benchmark decontamination: training documents that share ≥3 distinct
    * word 3-grams with any held-out/eval document (here: doc_id % 100 == 0
    * stands in for the benchmark set). The eval n-gram index is tiny
    * relative to the corpus, so at this scale it BROADCASTS — the
    * corpus-side scan stream-probes a hash set and never shuffles by
    * shingle. No explicit broadcast hint: the eval set is ~1% of corpus
    * distinct 3-grams and GROWS WITH THE CORPUS, so a forced hint would
    * OOM once the index outgrows broadcast range — AQE sees the actual
    * post-shuffle size and picks broadcast while it fits, then degrades
    * to a shuffle equi-join on the shingle when it doesn't. This is the
    * n-gram-overlap contamination check (à la GPT-3/PaLM appendix
    * methodology) every pretraining pipeline runs before evaluation.
    */
  def decontamination(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val sh = docs.select(col("doc_id"),
      explode(array_distinct(TextFunctions.shingles(col("text"), 3))).as("shingle"))
    val evalSh = sh.filter(col("doc_id") % 100 === 0).select("shingle").distinct()
    sh.filter(col("doc_id") % 100 =!= 0)
      .join(evalSh, Seq("shingle"))
      // (doc_id, shingle) is distinct after array_distinct+explode, so a
      // plain count IS the distinct-shared-shingle count — no
      // count(distinct) expansion in the aggregate
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= 3)
  }

  /** Gopher-style repetition quality signals, per language: duplicate-token
    * ratio (1 − distinct/total) and top-token fraction (most frequent
    * token's share), plus how many documents cross the repetitive-doc
    * threshold. Two-phase aggregation — explode → (doc,token) partial
    * counts → per-doc stats — keeps every stage a hash aggregate; no
    * per-doc collection ever materializes.
    */
  def repetitionStats(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val perTok = docs
      .select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("t"))
      .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("c"))
    val perDoc = perTok.groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tok"), count(lit(1)).as("n_distinct"),
           max(col("c")).as("top_c"))
    // left join so zero-token docs still count with ratio 0
    docs.select(col("doc_id"), col("lang"))
      .join(perDoc, Seq("doc_id"), "left")
      .withColumn("dup_ratio", when(col("n_tok").isNull, lit(0.0))
        .otherwise(lit(1.0) - col("n_distinct").cast("double") / col("n_tok")))
      .withColumn("top_frac", when(col("n_tok").isNull, lit(0.0))
        .otherwise(col("top_c").cast("double") / col("n_tok")))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
           davg(col("dup_ratio")).as("avg_dup_ratio"),
           davg(col("top_frac")).as("avg_top_frac"),
           count(when(col("top_frac") >= 0.05, 1)).as("n_repetitive"))
  }

  /** LAG-based inter-event gaps per user: total/max gap seconds and
    * session-break count. Gap arithmetic stays on epoch-second longs
    * (exact), and the window orders by (ts_s, event_id) so consecutive
    * differences are the sorted-sequence diffs in both engines.
    */
  def userGaps(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_s"), col("event_id"))
    Tables.events(s, dir).filter(col("user_id") < 50)
      .withColumn("ts_s", col("ts").cast("long"))
      .withColumn("gap", col("ts_s") - lag(col("ts_s"), 1).over(w))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
           sum(col("gap")).as("sum_gap_s"),
           max(col("gap")).as("max_gap_s"),
           count(when(col("gap") > 1800L, 1)).as("n_breaks"))
  }

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

  /** Corpus-level top-25 bigrams (raw frequency, within-doc repeats
    * counted). Explode → hash aggregate → TakeOrderedAndProject: the
    * top-k never sorts the full bigram vocabulary.
    */
  def topBigrams(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(explode(TextFunctions.shingles(col("text"), 2)).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram").asc)
      .limit(25)

  /** Deterministic stratified sample: first 20 documents per language in
    * content-hash order — reproducible across runs, engines, and
    * partitionings (the property random() sampling loses), evenly spread
    * over the corpus because the hash order is content-uniform.
    */
  def stratifiedSample(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graft.TextHashExpressions
    val w = Window.partitionBy(col("lang"))
      .orderBy(TextHashExpressions.fnv64(col("text")).asc, col("doc_id").asc)
    Tables.documents(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 20)
      .select(col("lang"), col("doc_id"), col("rn"))
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

  /** Token-budget truncation: the "clip every document to its first N
    * tokens" pass a pretraining pipeline runs when packing sequences.
    * Per language: docs over budget, tokens kept, characters kept —
    * slice + aggregate higher-order functions, all codegen-friendly,
    * zero shuffles before the final aggregate.
    */
  def tokenBudget(s: SparkSession, dir: String): DataFrame = {
    val budget = 32
    Tables.documents(s, dir)
      .withColumn("toks", TextFunctions.tokens(col("text")))
      .withColumn("n_tok", size(col("toks")).cast("long"))
      .withColumn("kept_chars",
        aggregate(slice(col("toks"), 1, budget), lit(0L),
          (acc, t) => acc + length(t).cast("long")))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
           count(when(col("n_tok") > budget, 1)).as("n_truncated"),
           sum(least(col("n_tok"), lit(budget.toLong))).as("kept_tokens"),
           sum(col("kept_chars")).as("kept_chars"))
  }

  /** Int8 scalar quantization of embeddings: q = clamp(⌊x·512⌋, ±127),
    * the storage-compression step of a vector index build. All arithmetic
    * is exact across engines (×512 is a power-of-two double multiply —
    * no rounding — and floor/clamp are integral), so the per-label sums
    * hash-match. Saturation counts surface how much of the corpus the
    * chosen scale clips.
    */
  def embQuantize(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .withColumn("qv", transform(col("embedding"), x =>
        greatest(lit(-127L), least(lit(127L),
          floor(x.cast("double") * 512.0).cast("long")))))
      .withColumn("sum_q", aggregate(col("qv"), lit(0L), (a, b) => a + b))
      .withColumn("n_sat", size(filter(col("qv"), v => abs(v) === 127L)).cast("long"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
           sum(col("sum_q")).as("sum_q"),
           sum(col("n_sat")).as("n_saturated"))

  /** Asymmetric containment near-dup (doc-inside-doc): smaller shingle
    * set ≥80% contained in a larger one — the quote/concatenation case
    * Jaccard misses. Bounded to the same deterministic id slice as
    * q22/q45.
    */
  def containmentDups(s: SparkSession, dir: String): DataFrame =
    Dedup.containmentPairs(
      Tables.documents(s, dir).filter(col("doc_id") < 1000),
      "doc_id", "text", shingleSize = 2, threshold = 0.8)

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

  /** Sequence-packing accounting (concat-then-chunk, the GPT-style
    * packing strategy): per language, documents concatenate in
    * content-hash order and split into fixed 2048-token context windows.
    * Emits bins needed and how many documents straddle a bin boundary —
    * the packing-efficiency numbers a pretraining pipeline reports.
    * Deterministic: the hash order is total and the cumulative sums are
    * integer arithmetic. At scale the same window runs per (lang, shard)
    * — packing is embarrassingly parallel across shards by construction.
    */
  def sequencePack(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graft.TextHashExpressions
    val binTokens = 2048L
    val w = Window.partitionBy(col("lang"))
      .orderBy(TextHashExpressions.fnv64(col("text")).asc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(s, dir)
      .withColumn("n_tok", TextFunctions.tokenCount(col("text")).cast("long"))
      .withColumn("cum_before", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      // integer `div` keeps bin ids exact at any corpus size (a double
      // floor would drift past 2^53 cumulative tokens)
      .withColumn("splits", when(col("n_tok") > 0,
        expr(s"(cum_before + n_tok - 1) div $binTokens - cum_before div $binTokens"))
        .otherwise(lit(0L)))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n_tok")).as("total_tokens"),
           expr(s"(sum(n_tok) + ${binTokens - 1}) div $binTokens").as("n_bins"),
           count(when(col("splits") > 0, 1)).as("n_boundary_docs"))
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

  /** Salted two-phase aggregation over a genuinely skewed key: events
    * have ~5 distinct types, so an unsalted groupBy condemns a 1000-
    * executor cluster to 5 reducers. The deterministic salt (hash of
    * event_id, not rand() — retried tasks must reproduce) spreads each
    * hot key over 32 partial aggregates; the final merge re-sums exact
    * decimals, so the answer is bit-identical to the unsalted query —
    * which is exactly what the oracle states.
    */
  def saltedEventSum(s: SparkSession, dir: String): DataFrame =
    graft.operators.Skew.saltedSum(
        Tables.events(s, dir), "event_type", "value",
        saltSource = col("event_id"), saltBuckets = 32,
        valueTransform = _.cast(ExactNum.Dec))
      .select(col("event_type"),
        col("sum_value").cast("double").as("sum_value"), col("n"))

  /** The END-TO-END curation funnel as one oracle-checked query:
    * normalized exact dedup → near-dup cluster removal → quality floor →
    * benchmark decontamination → content-hash split, reported as
    * survivors per (lang, split). Every stage's SQL twin is proven
    * individually (q49, q45/q54, q41, q55, q46); this composes them —
    * the strongest correctness statement the gate can make about
    * [[graft.pipelines.CurationPipeline]]. Bounded to the deterministic
    * id slice the pair oracles use.
    */
  def curationFunnel(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).filter(col("doc_id") < 1000)
    val eval = docs.filter(col("doc_id") % 100 === 0).select(col("text"))
    val train = docs.filter(col("doc_id") % 100 =!= 0)
    graft.pipelines.CurationPipeline.curate(train, eval)
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n_docs"))
  }

  /** Array aggregation (collect_set) made deterministic: the collected
    * set is SORTED before any use, so the nondeterministic accumulation
    * order can't leak into results — emitted as a joined string (the
    * cross-engine-stable array representation).
    */
  def collectAgg(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(
        concat_ws(",", transform(
          slice(sort_array(collect_set(when(col("value") > 99, col("user_id")))), 1, 3),
          _.cast("string"))).as("first_users"),
        count(when(col("value") > 99, 1)).as("n_high"))

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

  /** UNPIVOT (melt): q43's wide per-user event-count matrix back to
    * long form, zero cells preserved — the wide↔long reshape pair
    * (pivot q43 / unpivot here) a feature-engineering pipeline round-
    * trips through. Uses the Spark 4 `unpivot` Dataset API.
    */
  def unpivotEventCounts(s: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    eventTypePivot(s, dir)
      .unpivot(Array(col("user_id")), types.map(col).toArray, "event_type", "n")
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

  /** exists / forall higher-order predicates over the token array —
    * per language, documents containing any long token and documents
    * whose tokens are ALL short (the per-row any/all quantifiers the
    * HOF family still lacked; transform/aggregate/filter/slice appear
    * in q63/q64).
    */
  def tokenQuantifiers(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("toks", TextFunctions.tokens(col("text")))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
           count(when(exists(col("toks"), t => length(t) > 15), 1)).as("n_any_long"),
           count(when(forall(col("toks"), t => length(t) < 12), 1)).as("n_all_short"))

  /** Gap-filled daily event series: `sequence()` generates the full day
    * range so zero-activity days appear explicitly — the densification
    * step time-series reporting needs before window math. The generator
    * explodes from ONE driver-free row (min/max come from an aggregate),
    * so the series never routes through the driver.
    */
  def gapFilledDaily(s: SparkSession, dir: String): DataFrame = {
    // floor(), not a cast: the oracle floors epoch/86400, and for
    // pre-1970 (negative) timestamps a double divide + cast-to-long
    // truncates toward zero instead of flooring. (Spark's `div` also
    // truncates — IntegralDivide uses integral quot semantics.)
    val ev = Tables.events(s, dir)
      .select(floor(col("ts").cast("long") / lit(86400L)).as("d"))
    val perDay = ev.groupBy(col("d")).agg(count(lit(1)).as("n_events"))
    val days = ev.agg(min(col("d")).as("lo"), max(col("d")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("d"))
    days.join(perDay, Seq("d"), "left")
      .select(col("d"), coalesce(col("n_events"), lit(0L)).as("n_events"))
  }

  // ---------------------------------------------------------------- wiring

  val all: Map[String, Q] = Map(
    "q01_pricing_summary"   -> (pricingSummary _),
    "q02_region_revenue"    -> (regionRevenue _),
    "q03_join_priority"     -> (joinPriority _),
    "q04_topk_orders"       -> (topkOrders _),
    "q05_window_rank"       -> (windowRank _),
    "q06_anti_join"         -> (antiJoin _),
    "q07_semi_join"         -> (semiJoin _),
    "q08_distinct_agg"      -> (distinctAgg _),
    "q09_union_nations"     -> (unionNations _),
    "q10_event_window_sum"  -> (eventWindowSum _),
    "q11_event_conditional" -> (eventConditionalWindow _),
    "q12_event_json"        -> (eventJsonExtract _),
    "q13_sessionize"        -> (sessionize _),
    "q14_event_top_users"   -> (eventTopUsers _),
    "q15_dedup_exact"       -> (dedupExact _),
    "q16_token_stats"       -> (tokenStats _),
    "q17_quality_stats"     -> (qualityStats _),
    "q18_langid"            -> (langId _),
    "q19_fingerprint"       -> (fingerprints _),
    "q20_minhash_lsh"       -> (minhashPairs _),
    "q21_simhash"           -> (simhashSignatures _),
    "q22_jaccard_pairs"     -> (jaccardPairs _),
    "q23_knn_brute"         -> (knnBrute _),
    "q24_knn_lsh"           -> (knnLsh _),
    "q25_centroid_stats"    -> (centroidStats _),
    "q26_media_meta"        -> (mediaMeta _),
    "q27_emb_neardup"       -> (embNearDupExact _),
    "q28_emb_neardup_lsh"   -> (embNearDupLsh _),
    "q29_media_decode"      -> (mediaDecode _),
    "q30_media_frames"      -> (mediaFrames _),
    "q31_subword_stats"     -> (subwordStats _),
    "q32_simhash_neardup"   -> (simhashNearDups _),
    "q33_rollup"            -> (rollupSummary _),
    "q34_setops"            -> (setOpsNations _),
    "q35_running_total"     -> (runningTotal _),
    "q36_above_avg"         -> (aboveAvgBalance _),
    "q37_session_windows"   -> (sessionWindows _),
    "q38_knn_ivf"           -> (knnIvf _),
    "q39_percentiles"       -> (percentiles _),
    "q40_price_histogram"   -> (priceHistogram _),
    "q41_quality_score"     -> (qualityScoreStats _),
    "q42_asof_join"         -> (asofLatestOrder _),
    "q43_event_pivot"       -> (eventTypePivot _),
    "q44_cube"              -> (cubeSummary _),
    "q45_dup_clusters"      -> (dupClusters _),
    "q46_hash_split"        -> (hashSplit _),
    "q47_tfidf_terms"       -> (tfidfTerms _),
    "q48_grouping_sets"     -> (groupingSetsSummary _),
    "q49_normalized_dedup"  -> (normalizedDedup _),
    "q50_range_join"        -> (rangeJoinEvents _),
    "q51_weighted_mix"      -> (weightedMix _),
    "q52_sliding_window"    -> (slidingWindowCounts _),
    "q53_pii_scan"          -> (piiScan _),
    "q54_dedup_survivors"   -> (dedupSurvivors _),
    "q55_decontam"          -> (decontamination _),
    "q56_repetition"        -> (repetitionStats _),
    "q57_user_gaps"         -> (userGaps _),
    "q58_above_own_avg"     -> (aboveOwnAvg _),
    "q59_mode"              -> (modeQuantity _),
    "q60_bigram_topk"       -> (topBigrams _),
    "q61_stratified_sample" -> (stratifiedSample _),
    "q62_full_outer"        -> (fullOuterNation _),
    "q63_token_budget"      -> (tokenBudget _),
    "q64_emb_quantize"      -> (embQuantize _),
    "q65_containment"       -> (containmentDups _),
    "q66_ntile_quartiles"   -> (ntileQuartiles _),
    "q67_monthly_orders"    -> (monthlyOrders _),
    "q68_trailing_window"   -> (trailingWindowOrders _),
    "q69_sequence_pack"     -> (sequencePack _),
    "q70_rank_metrics"      -> (rankMetrics _),
    "q71_salted_agg"        -> (saltedEventSum _),
    "q72_curation"          -> (curationFunnel _),
    "q73_collect_agg"       -> (collectAgg _),
    "q74_regex_extract"     -> (regexExtractAudit _),
    "q75_first_last"        -> (firstLastOrders _),
    "q76_unpivot"           -> (unpivotEventCounts _),
    "q77_setops_all"        -> (setOpsAll _),
    "q78_quantifiers"       -> (tokenQuantifiers _),
    "q79_gap_fill"          -> (gapFilledDaily _),
  )

  val oracles: Map[String, String] = Map(
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
    "q10_event_window_sum" ->
      s"""SELECT CAST(floor(epoch(ts)/300)*300 AS BIGINT) AS window_start,
         | event_type, ${dsumSql("value")} AS sum_value, COUNT(*) AS n_events
         |FROM events GROUP BY 1, 2""".stripMargin,
    "q11_event_conditional" ->
      """SELECT CAST(floor(epoch(ts)/3600)*3600 AS BIGINT) AS window_start,
        | COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS n_signup,
        | COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_error,
        | COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase
        |FROM events GROUP BY 1""".stripMargin,
    "q12_event_json" ->
      """SELECT event_type,
        | CAST(SUM(CAST(json_extract_string(props, 'k') AS BIGINT)) AS BIGINT) AS sum_k,
        | CAST(SUM(CAST(json_extract_string(props, 'k') AS BIGINT)) AS DOUBLE) / COUNT(*) AS avg_k,
        | COUNT(*) AS n
        |FROM events GROUP BY event_type""".stripMargin,
    "q13_sessionize" ->
      """WITH g AS (
        | SELECT user_id,
        |  CASE WHEN lag(ts) OVER w IS NULL
        |        OR epoch(ts) - epoch(lag(ts) OVER w) > 1800.0
        |       THEN 1 ELSE 0 END AS new_session
        | FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts))
        |SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions,
        | COUNT(*) AS n_events
        |FROM g GROUP BY user_id""".stripMargin,
    "q14_event_top_users" ->
      s"""SELECT user_id, ${dsumSql("value")} AS total_value, COUNT(*) AS n_events
         |FROM events GROUP BY user_id
         |ORDER BY total_value DESC, user_id LIMIT 20""".stripMargin,
    "q15_dedup_exact" ->
      """SELECT source, COUNT(*) AS n_docs, COUNT(DISTINCT md5(text)) AS n_unique
        |FROM documents GROUP BY source""".stripMargin,
    "q16_token_stats" ->
      """SELECT lang, COUNT(*) AS n_docs,
        | CAST(SUM(CASE WHEN length(trim(text)) = 0 THEN 0
        |   ELSE len(regexp_split_to_array(trim(text), '\s+')) END) AS BIGINT) AS total_tokens,
        | CAST(SUM(n_chars) AS BIGINT) AS total_chars
        |FROM documents GROUP BY lang""".stripMargin,
    "q17_quality_stats" ->
      s"""WITH f AS (
         | SELECT lang,
         |  CASE WHEN length(text) = 0 THEN 0.0
         |       ELSE CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE)
         |            / length(text) END AS punct_ratio,
         |  CASE WHEN len(regexp_split_to_array(trim(text), '\\s+')) = 0 THEN 0.0
         |       ELSE CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
         |              t -> t IN ('the','a','an','and','or','of','to','in','is','on','for','with'))) AS DOUBLE)
         |            / len(regexp_split_to_array(trim(text), '\\s+')) END AS stop_ratio
         | FROM documents)
         |SELECT lang, ${davgSql("punct_ratio")} AS avg_punct_ratio,
         | ${davgSql("stop_ratio")} AS avg_stop_ratio, COUNT(*) AS n_docs
         |FROM f GROUP BY lang""".stripMargin,
    "q18_langid" ->
      s"""SELECT lang, ${TextFunctions.langIdMarkersSql} AS predicted, COUNT(*) AS n
         |FROM documents GROUP BY 1, 2""".stripMargin,
    "q19_fingerprint" ->
      s"""WITH fp AS (
         | SELECT doc_id,
         |  ${rollSql(s"list_transform(${toksSql("text")}, t -> ${fnvSql("t")})")} AS ufp,
         |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS INT) AS n_subwords
         | FROM documents)
         |SELECT doc_id, ${signedSql("ufp")} AS fingerprint, n_subwords FROM fp""".stripMargin,
    "q20_minhash_lsh" ->
      """WITH t AS (
        | SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
        | FROM documents),
        |d AS (
        | SELECT doc_id,
        |  list_distinct([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS s
        | FROM t)
        |SELECT id_a, id_b, ROUND(j, 6) AS jaccard FROM (
        | SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |    / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS j
        | FROM d a JOIN d b ON a.doc_id < b.doc_id) x
        |WHERE j >= 0.7""".stripMargin,
    "q21_simhash" ->
      s"""WITH $simhashVotesSql,
         |su AS (SELECT doc_id, $simhashUnsignedPackSql AS us FROM sv)
         |SELECT d.doc_id, COALESCE(${signedSql("us")}, 0) AS simhash
         |FROM documents d LEFT JOIN su ON d.doc_id = su.doc_id""".stripMargin,
    "q32_simhash_neardup" ->
      s"""WITH $simhashVotesSql,
         |su AS (SELECT doc_id, $simhashUnsignedPackSql AS us FROM sv),
         |alld AS (SELECT d.doc_id, COALESCE(su.us, 0) AS us
         |  FROM documents d LEFT JOIN su ON d.doc_id = su.doc_id)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         | CAST(bit_count(xor(a.us, b.us)) AS INT) AS hamming
         |FROM alld a JOIN alld b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.us, b.us)) <= 7""".stripMargin,
    "q22_jaccard_pairs" ->
      """WITH t AS (
        | SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
        | FROM documents WHERE doc_id < 1000),
        |d AS (
        | SELECT doc_id,
        |  list_distinct([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS s
        | FROM t)
        |SELECT id_a, id_b, ROUND(j, 6) AS jaccard FROM (
        | SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |    / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS j
        | FROM d a JOIN d b ON a.doc_id < b.doc_id) x
        |WHERE j >= 0.5""".stripMargin,
    "q23_knn_brute" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 5)
        |SELECT query_id, neighbor_id, rank FROM (
        | SELECT q.query_id, c.vec_id AS neighbor_id,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY q.query_id
        |    ORDER BY list_cosine_similarity(q.qe, c.embedding) DESC, c.vec_id) AS INT) AS rank
        | FROM q CROSS JOIN embeddings c WHERE c.vec_id <> q.query_id) t
        |WHERE rank <= 10""".stripMargin,
    // replay of the deterministic LSH: same splitmix64 weight matrix
    // (embedded as literals), same multi-probe candidate rule (hamming
    // ≤ 1 in any of 4 six-plane tables), exact re-rank over candidates
    "q24_knn_lsh" -> {
      val buckets = (0 until 4).map(t => s"${bucketSql("emb", t, 6)} AS b$t").mkString(", ")
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
         |  FROM embeddings),
         |b AS (SELECT vec_id, emb, $buckets FROM e),
         |q AS (SELECT vec_id AS query_id, emb AS qe, b0 AS qb0, b1 AS qb1, b2 AS qb2, b3 AS qb3
         |  FROM b WHERE vec_id < 5)
         |SELECT query_id, neighbor_id, rank FROM (
         | SELECT q.query_id, c.vec_id AS neighbor_id,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY q.query_id
         |    ORDER BY list_cosine_similarity(q.qe, c.emb) DESC, c.vec_id) AS INT) AS rank
         | FROM q JOIN b c ON c.vec_id <> q.query_id
         |  AND ${anyTableCollidesSql("q.qb", "c.b", 4)}) t
         |WHERE rank <= 10""".stripMargin
    },
    "q25_centroid_stats" ->
      s"""SELECT label, COUNT(*) AS n,
         | ${favgSql("embedding[1]")} AS avg_d0,
         | ${favgSql("embedding[2]")} AS avg_d1,
         | ${favgSql("sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))")} AS avg_norm
         |FROM embeddings GROUP BY label""".stripMargin,
    "q26_media_meta" ->
      """SELECT source, COUNT(*) AS n_media,
        |CAST(SUM(octet_length(CAST(text AS BLOB))) AS BIGINT) AS total_bytes
        |FROM documents GROUP BY source""".stripMargin,
    "q27_emb_neardup" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
        | FROM embeddings WHERE vec_id < 300)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |FROM e a JOIN e b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.emb, b.emb) >= 0.4""".stripMargin,
    // LSH near-dup replay: bucket predicate (hamming ≤ 1 in either
    // 4-plane table) + the exact cosine threshold over candidates
    "q28_emb_neardup_lsh" -> {
      val buckets = (0 until 2).map(t => s"${bucketSql("emb", t, 4)} AS b$t").mkString(", ")
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
         |  FROM embeddings),
         |b AS (SELECT vec_id, emb, $buckets FROM e)
         |SELECT a.vec_id AS id_a, c.vec_id AS id_b
         |FROM b a JOIN b c ON a.vec_id < c.vec_id
         | AND ${anyTableCollidesSql("a.b", "c.b", 2)}
         |WHERE list_cosine_similarity(a.emb, c.emb) >= 0.35""".stripMargin
    },
    "q29_media_decode" ->
      """WITH m AS (
        | SELECT doc_id, octet_length(CAST(text AS BLOB)) AS n,
        |  CASE octet_length(CAST(text AS BLOB)) % 3
        |   WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'webp' END AS format
        | FROM documents)
        |SELECT format, COUNT(*) AS n_media,
        | CAST(SUM(64 * (1 + n % 16)) AS BIGINT) AS total_width,
        | CAST(SUM(64 * (1 + n % 9)) AS BIGINT) AS total_height,
        | CAST(SUM(n) AS BIGINT) AS total_bytes
        |FROM m GROUP BY format""".stripMargin,
    "q30_media_frames" ->
      """WITH f AS (
        | SELECT doc_id, CAST(ceil(octet_length(CAST(text AS BLOB)) / 256.0) AS BIGINT) AS n_frames
        | FROM documents)
        |SELECT source, COUNT(*) AS n_docs,
        | CAST(SUM(n_frames) AS BIGINT) AS total_frames
        |FROM f JOIN documents USING (doc_id) GROUP BY source""".stripMargin,
    "q31_subword_stats" ->
      """SELECT lang, COUNT(*) AS n_docs,
        | CAST(SUM(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]'))) AS BIGINT) AS total_subwords
        |FROM documents GROUP BY lang""".stripMargin,
    "q33_rollup" ->
      s"""SELECT l_returnflag, l_linestatus,
         | ${dsumSql("l_quantity")} AS sum_qty, COUNT(*) AS n
         |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,
    "q44_cube" ->
      s"""SELECT l_returnflag, l_linestatus,
         | ${dsumSql("l_quantity")} AS sum_qty, COUNT(*) AS n
         |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,
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
    // cosine (label tie-break), exact search inside the top-3 cells
    "q38_knn_ivf" -> {
      val centroid = "[" + (1 to 64).map(d => s"AVG(emb[$d])").mkString(",") + "]"
      s"""WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
         |  FROM embeddings),
         |cent AS (SELECT label, $centroid AS centroid FROM e GROUP BY label),
         |q AS (SELECT vec_id AS query_id, emb AS qe FROM e WHERE vec_id < 5),
         |probed AS (SELECT query_id, label FROM (
         | SELECT q.query_id, cent.label,
         |  ROW_NUMBER() OVER (PARTITION BY q.query_id
         |    ORDER BY list_cosine_similarity(q.qe, cent.centroid) DESC, cent.label) AS pr
         | FROM q CROSS JOIN cent) p WHERE pr <= 3)
         |SELECT query_id, neighbor_id, rank FROM (
         | SELECT q.query_id, c.vec_id AS neighbor_id,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY q.query_id
         |    ORDER BY list_cosine_similarity(q.qe, c.emb) DESC, c.vec_id) AS INT) AS rank
         | FROM q JOIN probed ON probed.query_id = q.query_id
         |  JOIN e c ON c.label = probed.label AND c.vec_id <> q.query_id) t
         |WHERE rank <= 10""".stripMargin
    },
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
    "q41_quality_score" ->
      s"""WITH toks AS (
         | SELECT lang, text, ${toksSql("text")} AS w FROM documents),
         |f AS (
         | SELECT lang,
         |  LEAST(CAST(length(text) AS DOUBLE) / 500.0, 1.0) AS len_score,
         |  GREATEST(0.0, 1.0 - (CASE WHEN length(text) = 0 THEN 0.0
         |    ELSE CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE)
         |         / length(text) END) * 5.0) AS punct_score,
         |  LEAST((CASE WHEN len(w) = 0 THEN 0.0
         |    ELSE CAST(len(list_filter(w,
         |           t -> t IN ('the','a','an','and','or','of','to','in','is','on','for','with'))) AS DOUBLE)
         |         / len(w) END) * 4.0, 1.0) AS stop_score,
         |  CASE WHEN len(w) = 0 THEN 0.0
         |       ELSE CAST(list_sum(list_transform(w, t -> length(t))) AS DOUBLE) / len(w) END AS mwl
         | FROM toks),
         |g AS (SELECT lang, ROUND((len_score + punct_score + stop_score) / 3.0, 6) AS q, mwl FROM f)
         |SELECT lang, ${davgSql("q")} AS avg_quality, ${davgSql("mwl")} AS avg_word_len,
         | COUNT(*) AS n_docs
         |FROM g GROUP BY lang""".stripMargin,
    "q42_asof_join" ->
      """WITH od AS (
        | SELECT o_custkey AS key, CAST(floor(epoch(o_orderdate)/86400) AS BIGINT) AS d,
        |        MAX(o_orderkey) AS okey
        | FROM orders GROUP BY 1, 2),
        |ev AS (
        | SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
        |        CAST(floor(epoch(ts)/86400) AS BIGINT) AS d
        | FROM events WHERE user_id < 20)
        |SELECT e.user_id, e.ts_s, o.okey
        |FROM ev e ASOF LEFT JOIN od o ON e.user_id = o.key AND e.d >= o.d""".stripMargin,
    "q43_event_pivot" ->
      """SELECT user_id,
        | COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
        | COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error,
        | COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
        | COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
        | COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view
        |FROM events GROUP BY user_id""".stripMargin,
    "q45_dup_clusters" ->
      """WITH RECURSIVE t AS (
        | SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
        | FROM documents WHERE doc_id < 1000),
        |d AS (
        | SELECT doc_id,
        |  list_distinct([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS s
        | FROM t),
        |p AS (
        | SELECT a.doc_id AS u, b.doc_id AS v
        | FROM d a JOIN d b ON a.doc_id < b.doc_id
        | WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |   / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5),
        |e AS (SELECT u, v FROM p UNION SELECT v AS u, u AS v FROM p),
        |reach AS (
        | SELECT u AS node, u AS r FROM e
        | UNION
        | SELECT reach.node, e.v AS r FROM reach JOIN e ON reach.r = e.u)
        |SELECT node AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY node""".stripMargin,
    "q46_hash_split" ->
      s"""WITH b AS (
         | SELECT lang, n_chars,
         |  (${fnvSql("text")} & 2147483647) % 100 AS bucket
         | FROM documents)
         |SELECT lang,
         | CASE WHEN bucket < 80 THEN 'train'
         |      WHEN bucket < 90 THEN 'valid' ELSE 'test' END AS split,
         | COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
         |FROM b GROUP BY 1, 2""".stripMargin,
    "q47_tfidf_terms" ->
      s"""WITH toks AS (
         | SELECT doc_id, lang, unnest(${toksSql("text")}) AS term FROM documents),
         |dfreq AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY term),
         |tf AS (SELECT lang, term, COUNT(*) AS tf FROM toks GROUP BY lang, term),
         |n AS (SELECT COUNT(*) AS n_total FROM documents),
         |scored AS (
         | SELECT lang, tf.term AS term,
         |  ROUND(tf * (n_total + 1.0) / (df + 1.0), 6) AS score
         | FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN n)
         |SELECT lang, term, score, rank FROM (
         | SELECT lang, term, score,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY lang
         |    ORDER BY score DESC, term) AS INT) AS rank
         | FROM scored) r
         |WHERE rank <= 5""".stripMargin,
    "q48_grouping_sets" ->
      s"""SELECT l_returnflag, l_linestatus,
         | ${dsumSql("l_quantity")} AS sum_qty, COUNT(*) AS n
         |FROM lineitem
         |GROUP BY GROUPING SETS ((l_returnflag), (l_returnflag, l_linestatus), ())""".stripMargin,
    "q49_normalized_dedup" ->
      """SELECT source, COUNT(*) AS n_docs,
        | COUNT(DISTINCT md5(lower(trim(regexp_replace(
        |   text, '[[:punct:][:space:]]+', ' ', 'g'))))) AS n_unique_normalized
        |FROM documents GROUP BY source""".stripMargin,
    "q50_range_join" ->
      """WITH ev AS (
        | SELECT user_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
        | FROM events),
        |a AS (SELECT user_id AS a_user, ts_s AS a_start
        |      FROM ev WHERE event_type = 'error')
        |SELECT a_user AS user_id, a_start AS anchor_s, COUNT(*) AS n_events
        |FROM a JOIN ev
        |  ON ev.user_id = a.a_user
        | AND ev.ts_s >= a.a_start AND ev.ts_s < a.a_start + 3600
        |GROUP BY 1, 2""".stripMargin,
    "q51_weighted_mix" ->
      s"""WITH b AS (
         | SELECT source,
         |  (${fnvSql("text")} & 2147483647) % 1000 AS bucket,
         |  CASE (CAST(substr(source, 4) AS INT) % 4)
         |   WHEN 0 THEN 1000 WHEN 1 THEN 500 WHEN 2 THEN 250 ELSE 100
         |  END AS thr
         | FROM documents)
         |SELECT source, COUNT(*) AS n_total,
         | COUNT(CASE WHEN bucket < thr THEN 1 END) AS n_kept
         |FROM b GROUP BY source""".stripMargin,
    "q52_sliding_window" ->
      s"""WITH w AS (
         | SELECT event_type, value,
         |  unnest([CAST(floor(epoch(ts)/300)*300 AS BIGINT),
         |          CAST(floor(epoch(ts)/300)*300 - 300 AS BIGINT)]) AS window_start
         | FROM events WHERE ts IS NOT NULL)
         |SELECT window_start, event_type, COUNT(*) AS n_events,
         | ${dsumSql("value")} AS sum_value
         |FROM w GROUP BY 1, 2""".stripMargin,
    "q53_pii_scan" ->
      """SELECT source, COUNT(*) AS n_docs,
        | COUNT(CASE WHEN regexp_matches(text,
        |   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}') THEN 1 END) AS n_with_email,
        | COUNT(CASE WHEN regexp_matches(text,
        |   'https?://[A-Za-z0-9./_-]+') THEN 1 END) AS n_with_url,
        | COUNT(CASE WHEN regexp_matches(text,
        |   '[A-Za-z]{8,}') THEN 1 END) AS n_with_longword
        |FROM documents GROUP BY source""".stripMargin,
    "q54_dedup_survivors" ->
      """WITH RECURSIVE t AS (
        | SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
        | FROM documents WHERE doc_id < 1000),
        |d AS (
        | SELECT doc_id,
        |  list_distinct([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS s
        | FROM t),
        |p AS (
        | SELECT a.doc_id AS u, b.doc_id AS v
        | FROM d a JOIN d b ON a.doc_id < b.doc_id
        | WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |   / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5),
        |e AS (SELECT u, v FROM p UNION SELECT v AS u, u AS v FROM p),
        |reach AS (
        | SELECT u AS node, u AS r FROM e
        | UNION
        | SELECT reach.node, e.v AS r FROM reach JOIN e ON reach.r = e.u),
        |dropped AS (
        | SELECT node AS doc_id FROM reach GROUP BY node
        | HAVING MIN(r) <> node)
        |SELECT lang, COUNT(*) AS n_survivors
        |FROM documents
        |WHERE doc_id < 1000 AND doc_id NOT IN (SELECT doc_id FROM dropped)
        |GROUP BY lang""".stripMargin,
    "q55_decontam" ->
      s"""WITH t AS (SELECT doc_id, ${toksSql("text")} AS w FROM documents),
         |d AS (SELECT doc_id,
         |  list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
         |                 for i in range(1, len(w)-1)]) AS s
         | FROM t),
         |ev AS (SELECT DISTINCT unnest(s) AS shingle FROM d WHERE doc_id % 100 = 0),
         |tr AS (SELECT doc_id, unnest(s) AS shingle FROM d WHERE doc_id % 100 <> 0)
         |SELECT doc_id, COUNT(*) AS n_shared
         |FROM tr JOIN ev USING (shingle)
         |GROUP BY doc_id HAVING COUNT(*) >= 3""".stripMargin,
    "q56_repetition" ->
      s"""WITH tok AS (SELECT doc_id, unnest(${toksSql("text")}) AS t FROM documents),
         |pt AS (SELECT doc_id, t, COUNT(*) AS c FROM tok GROUP BY doc_id, t),
         |pd AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tok,
         |        COUNT(*) AS n_distinct, MAX(c) AS top_c
         |       FROM pt GROUP BY doc_id),
         |f AS (SELECT d.lang,
         |  CASE WHEN pd.doc_id IS NULL THEN 0.0
         |       ELSE 1.0 - CAST(n_distinct AS DOUBLE) / n_tok END AS dup_ratio,
         |  CASE WHEN pd.doc_id IS NULL THEN 0.0
         |       ELSE CAST(top_c AS DOUBLE) / n_tok END AS top_frac
         | FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id)
         |SELECT lang, COUNT(*) AS n_docs,
         | ${davgSql("dup_ratio")} AS avg_dup_ratio,
         | ${davgSql("top_frac")} AS avg_top_frac,
         | COUNT(CASE WHEN top_frac >= 0.05 THEN 1 END) AS n_repetitive
         |FROM f GROUP BY lang""".stripMargin,
    "q57_user_gaps" ->
      """WITH e AS (
        | SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
        | FROM events WHERE user_id < 50),
        |g AS (
        | SELECT user_id,
        |  ts_s - LAG(ts_s) OVER (PARTITION BY user_id ORDER BY ts_s, event_id) AS gap
        | FROM e)
        |SELECT user_id, COUNT(*) AS n_events,
        | CAST(SUM(gap) AS BIGINT) AS sum_gap_s,
        | MAX(gap) AS max_gap_s,
        | COUNT(CASE WHEN gap > 1800 THEN 1 END) AS n_breaks
        |FROM g GROUP BY user_id""".stripMargin,
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
    "q60_bigram_topk" ->
      s"""WITH t AS (SELECT ${toksSql("text")} AS w FROM documents),
         |b AS (SELECT unnest([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS bigram
         |      FROM t)
         |SELECT bigram, COUNT(*) AS n FROM b GROUP BY bigram
         |ORDER BY n DESC, bigram LIMIT 25""".stripMargin,
    "q61_stratified_sample" ->
      s"""WITH h0 AS (SELECT lang, doc_id, ${fnvSql("text")} AS ufh FROM documents),
         |h AS (SELECT lang, doc_id, ${signedSql("ufh")} AS fh FROM h0)
         |SELECT lang, doc_id, rn FROM (
         | SELECT lang, doc_id,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY fh, doc_id) AS INT) AS rn
         | FROM h) t WHERE rn <= 20""".stripMargin,
    "q62_full_outer" ->
      """WITH c AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer
        |           WHERE c_mktsegment = 'MACHINERY' GROUP BY 1),
        |s AS (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier
        |      WHERE s_acctbal > 9000 GROUP BY 1)
        |SELECT COALESCE(c.nk, s.nk) AS nationkey,
        | COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
        |FROM c FULL JOIN s ON c.nk = s.nk""".stripMargin,
    "q63_token_budget" ->
      s"""WITH t AS (SELECT lang, ${toksSql("text")} AS w FROM documents),
         |f AS (SELECT lang, len(w) AS n_tok,
         |  COALESCE(list_sum(list_transform(w[1:32], x -> length(x))), 0) AS kept_chars
         | FROM t)
         |SELECT lang, COUNT(*) AS n_docs,
         | COUNT(CASE WHEN n_tok > 32 THEN 1 END) AS n_truncated,
         | CAST(SUM(LEAST(n_tok, 32)) AS BIGINT) AS kept_tokens,
         | CAST(SUM(kept_chars) AS BIGINT) AS kept_chars
         |FROM f GROUP BY lang""".stripMargin,
    "q64_emb_quantize" ->
      """WITH e AS (
        | SELECT label, list_transform(embedding, x ->
        |   GREATEST(-127, LEAST(127, CAST(floor(CAST(x AS DOUBLE) * 512.0) AS BIGINT)))) AS qv
        | FROM embeddings)
        |SELECT label, COUNT(*) AS n_vecs,
        | CAST(SUM(list_sum(qv)) AS BIGINT) AS sum_q,
        | CAST(SUM(len(list_filter(qv, v -> abs(v) = 127))) AS BIGINT) AS n_saturated
        |FROM e GROUP BY label""".stripMargin,
    "q65_containment" ->
      """WITH t AS (
        | SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
        | FROM documents WHERE doc_id < 1000),
        |d AS (
        | SELECT doc_id,
        |  list_distinct([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS s
        | FROM t WHERE len(w) >= 2)
        |SELECT id_inner, id_outer, ROUND(c, 6) AS containment FROM (
        | SELECT a.doc_id AS id_inner, b.doc_id AS id_outer,
        |  CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(a.s) AS c
        | FROM d a JOIN d b
        |   ON (len(b.s) > len(a.s) OR (len(b.s) = len(a.s) AND a.doc_id < b.doc_id))) x
        |WHERE c >= 0.8""".stripMargin,
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
    "q69_sequence_pack" -> {
      val nTok = s"CASE WHEN length(trim(text)) = 0 THEN 0 " +
        s"ELSE len(regexp_split_to_array(trim(text), '\\s+')) END"
      s"""WITH h0 AS (SELECT lang, doc_id, CAST($nTok AS BIGINT) AS n_tok,
         |  ${fnvSql("text")} AS ufh FROM documents),
         |h AS (SELECT lang, doc_id, n_tok, ${signedSql("ufh")} AS fh FROM h0),
         |c AS (SELECT lang, n_tok,
         |  COALESCE(SUM(n_tok) OVER (PARTITION BY lang ORDER BY fh, doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
         | FROM h),
         |f AS (SELECT lang, n_tok,
         |  CASE WHEN n_tok > 0
         |       THEN (cum_before + n_tok - 1) // 2048 - cum_before // 2048
         |       ELSE 0 END AS splits
         | FROM c)
         |SELECT lang, COUNT(*) AS n_docs,
         | CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
         | CAST((SUM(n_tok) + 2047) // 2048 AS BIGINT) AS n_bins,
         | COUNT(CASE WHEN splits > 0 THEN 1 END) AS n_boundary_docs
         |FROM f GROUP BY lang""".stripMargin
    },
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
    "q71_salted_agg" ->
      s"""SELECT event_type, ${dsumSql("value")} AS sum_value, COUNT(*) AS n
         |FROM events GROUP BY event_type""".stripMargin,
    // composed from the stage fragments proven by q49/q45/q41/q55/q46
    "q72_curation" -> {
      val stop = "('the','a','an','and','or','of','to','in','is','on','for','with')"
      val punctRatio = "CASE WHEN length(text) = 0 THEN 0.0 ELSE " +
        "CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE)" +
        " / length(text) END"
      s"""WITH RECURSIVE base AS (
         | SELECT doc_id, text, lang FROM documents
         | WHERE doc_id < 1000 AND doc_id % 100 <> 0),
         |evald AS (SELECT text FROM documents
         | WHERE doc_id < 1000 AND doc_id % 100 = 0),
         |nh AS (SELECT doc_id, text, lang,
         |  md5(lower(trim(regexp_replace(text, '[[:punct:][:space:]]+', ' ', 'g')))) AS h
         | FROM base),
         |ded AS (SELECT doc_id, text, lang FROM (
         |  SELECT doc_id, text, lang,
         |   ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id) AS rn FROM nh) z
         | WHERE rn = 1),
         |t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM ded),
         |d AS (SELECT doc_id,
         |  list_distinct([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS s FROM t),
         |p AS (SELECT a.doc_id AS u, b.doc_id AS v
         | FROM d a JOIN d b ON a.doc_id < b.doc_id
         | WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
         |   / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5),
         |e AS (SELECT u, v FROM p UNION SELECT v AS u, u AS v FROM p),
         |reach AS (
         | SELECT u AS node, u AS r FROM e
         | UNION
         | SELECT reach.node, e.v AS r FROM reach JOIN e ON reach.r = e.u),
         |dropped AS (SELECT node AS doc_id FROM reach GROUP BY node HAVING MIN(r) <> node),
         |surv AS (SELECT doc_id, text, lang FROM ded
         | WHERE doc_id NOT IN (SELECT doc_id FROM dropped)),
         |qt AS (SELECT doc_id, text, lang, ${toksSql("text")} AS w FROM surv),
         |qual AS (SELECT doc_id, text, lang FROM qt
         | WHERE ROUND((
         |   LEAST(CAST(length(text) AS DOUBLE) / 500.0, 1.0)
         |   + GREATEST(0.0, 1.0 - ($punctRatio) * 5.0)
         |   + LEAST((CASE WHEN len(w) = 0 THEN 0.0
         |      ELSE CAST(len(list_filter(w, x -> x IN $stop)) AS DOUBLE) / len(w) END) * 4.0, 1.0)
         |  ) / 3.0, 6) >= 0.3),
         |dq AS (SELECT doc_id,
         |  list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
         |                 for i in range(1, len(w)-1)]) AS s
         | FROM (SELECT doc_id, ${toksSql("text")} AS w FROM qual) zq),
         |de AS (SELECT DISTINCT unnest(s) AS shingle FROM (
         |  SELECT list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
         |                        for i in range(1, len(w)-1)]) AS s
         |  FROM (SELECT ${toksSql("text")} AS w FROM evald) ze) zs),
         |contaminated AS (SELECT doc_id FROM (
         |  SELECT doc_id, unnest(s) AS shingle FROM dq) x
         | JOIN de USING (shingle) GROUP BY doc_id HAVING COUNT(*) >= 3),
         |clean AS (SELECT doc_id, text, lang FROM qual
         | WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)),
         |sp AS (SELECT lang,
         |  CASE WHEN (${fnvSql("text")} & 2147483647) % 100 < 80 THEN 'train'
         |       WHEN (${fnvSql("text")} & 2147483647) % 100 < 90 THEN 'valid'
         |       ELSE 'test' END AS split
         | FROM clean)
         |SELECT lang, split, COUNT(*) AS n_docs FROM sp GROUP BY 1, 2""".stripMargin
    },
    "q73_collect_agg" ->
      """SELECT event_type,
        | COALESCE(array_to_string(
        |   (list_sort(list(DISTINCT user_id) FILTER (WHERE value > 99)))[1:3], ','),
        |  '') AS first_users,
        | COUNT(CASE WHEN value > 99 THEN 1 END) AS n_high
        |FROM events GROUP BY event_type""".stripMargin,
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
    "q76_unpivot" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |ty AS (SELECT unnest(['click','error','purchase','signup','view']) AS event_type),
        |c AS (SELECT user_id, event_type, COUNT(*) AS n FROM events GROUP BY 1, 2)
        |SELECT u.user_id, ty.event_type, COALESCE(c.n, 0) AS n
        |FROM u CROSS JOIN ty LEFT JOIN c USING (user_id, event_type)""".stripMargin,
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
    "q78_quantifiers" ->
      s"""WITH t AS (SELECT lang, ${toksSql("text")} AS w FROM documents)
         |SELECT lang, COUNT(*) AS n_docs,
         | COUNT(CASE WHEN len(list_filter(w, x -> length(x) > 15)) > 0 THEN 1 END)
         |   AS n_any_long,
         | COUNT(CASE WHEN len(list_filter(w, x -> length(x) >= 12)) = 0 THEN 1 END)
         |   AS n_all_short
         |FROM t GROUP BY lang""".stripMargin,
    "q79_gap_fill" ->
      """WITH e AS (
        | SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d FROM events),
        |pd AS (SELECT d, COUNT(*) AS n_events FROM e GROUP BY d),
        |r AS (SELECT unnest(generate_series((SELECT MIN(d) FROM e),
        |                                    (SELECT MAX(d) FROM e))) AS d)
        |SELECT r.d, COALESCE(pd.n_events, 0) AS n_events
        |FROM r LEFT JOIN pd USING (d)""".stripMargin,
    "q37_session_windows" ->
      """WITH g AS (
        | SELECT user_id, ts,
        |  CASE WHEN lag(ts) OVER w IS NULL
        |        OR epoch(ts) - epoch(lag(ts) OVER w) >= 1800.0
        |       THEN 1 ELSE 0 END AS new_session
        | FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (
        | SELECT user_id, ts,
        |  SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        | FROM g)
        |SELECT user_id,
        | CAST(floor(epoch(MIN(ts))) AS BIGINT) AS session_start,
        | COUNT(*) AS n_events
        |FROM s GROUP BY user_id, session_id""".stripMargin,
  )
}
