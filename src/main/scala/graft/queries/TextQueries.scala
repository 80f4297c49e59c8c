package graft.queries

import graft.Tables
import graft.functions.{ExactNum, TextFunctions, VectorFunctions}
import graft.operators.{Dedup, Sessionize, Similarity, WindowedAgg}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis family: token/quality/language statistics,
  * TF-IDF, fingerprinting, deterministic splits/sampling/mixing, and
  * sequence-packing accounting over `documents`.
  *
  * Mixed into [[QueryPack]]; oracle SQL for each query lives beside its
  * Spark form in [[textOracles]].
  */
private[queries] trait TextQueries {
  import ExactNum._
  import SqlTwins._

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

  /** BPE-ish subword counting over the raw text, per language. */
  def subwordStats(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("n_subwords", TextFunctions.subwordCount(col("text")).cast("long"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_subwords")).as("total_subwords"))

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

  /** C4/Gopher-style quality-rule bundle — the canonical "clean the
    * crawl" pass: five document-level rules evaluated in ONE map-side
    * projection (no per-rule pass, no shuffle before the per-language
    * rollup), with per-rule failure counts so the gate is explainable,
    * not just a keep bit. Rules (thresholds sit inside this corpus's
    * measured distribution so both branches are exercised):
    * length ≥ 25 tokens; duplicate-token ratio ≤ 0.6; stopword ratio
    * ≥ 0.02; mean word length in [3.0, 5.0]; punctuation ratio ≤ 0.05.
    * Every ratio is an integer-over-integer IEEE division compared
    * against a literal, and the oracle restates the identical
    * expression tree — boundary documents decide the same way in both
    * engines. Failure counts are non-exclusive (a doc can fail several
    * rules); `n_kept` counts docs failing none.
    */
  def c4Filter(s: SparkSession, dir: String): DataFrame =
    c4FilterStats(Tables.documentsWide(s, dir))

  /** [[c4Filter]]'s core — exposed for the spec's per-rule planted
    * documents. */
  private[graft] def c4FilterStats(docs: DataFrame): DataFrame = {
    val flagged = docs.select(col("lang"), col("text"))
      .withColumn("toks", TextFunctions.tokens(col("text")))
      .withColumn("n_tok", size(col("toks")))
      .withColumn("dup_ratio", when(col("n_tok") === 0, lit(0.0))
        .otherwise(lit(1.0) -
          size(array_distinct(col("toks"))).cast("double") / col("n_tok")))
      .withColumn("stop_ratio", when(col("n_tok") === 0, lit(0.0))
        .otherwise(size(filter(col("toks"),
          t => t.isin(TextFunctions.Stopwords.map(x => x: Any): _*)))
          .cast("double") / col("n_tok")))
      .withColumn("mean_wl", when(col("n_tok") === 0, lit(0.0))
        .otherwise(aggregate(col("toks"), lit(0L),
          (acc, t) => acc + length(t)).cast("double") / col("n_tok")))
      .withColumn("punct_ratio", TextFunctions.punctRatio(col("text")))
      .withColumn("f_len", col("n_tok") < 25)
      .withColumn("f_rep", col("dup_ratio") > 0.6)
      .withColumn("f_stop", col("stop_ratio") < 0.02)
      .withColumn("f_wl", col("mean_wl") < 3.0 || col("mean_wl") > 5.0)
      .withColumn("f_punct", col("punct_ratio") > 0.05)
    flagged.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
           count(when(!col("f_len") && !col("f_rep") && !col("f_stop") &&
             !col("f_wl") && !col("f_punct"), 1)).as("n_kept"),
           count(when(col("f_len"), 1)).as("n_fail_len"),
           count(when(col("f_rep"), 1)).as("n_fail_rep"),
           count(when(col("f_stop"), 1)).as("n_fail_stop"),
           count(when(col("f_wl"), 1)).as("n_fail_wordlen"),
           count(when(col("f_punct"), 1)).as("n_fail_punct"))
  }

  /** Hashed-feature linear quality classifier — the fastText-style
    * model gate next to q41's hand-crafted heuristics and q99's rule
    * bundle: tokens hash into 64 weight buckets (the hashing trick) and
    * the document scores the mean bucket weight
    * ([[TextFunctions.hashedLinearScore]]). Scores floor-quantize at
    * 1e-6 (tie-free cross-engine, the q90 pattern); per language: doc
    * count, kept count at the −0.25 margin threshold, exact-decimal
    * average score. The weights here are a deterministic stand-in — a
    * trained model's vector slots in behind the same signature — but
    * the EXECUTION SHAPE is the production one: entirely map-side, the
    * model riding the expression tree as literals, one aggregate
    * exchange for the rollup and nothing else.
    */
  def qualityClassifier(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("score",
        floor(TextFunctions.hashedLinearScore(col("text")) * 1e6) / 1e6)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
           count(when(col("score") >= -0.25, 1)).as("n_kept"),
           davg(col("score")).as("avg_score"))

  /** KMV distinct-count sketch vs the exact count — the mergeable
    * distinct estimator whose estimate replays EXACTLY in SQL (unlike
    * HLL, every intermediate is an integer or a shared IEEE dag): the
    * sketch is the k smallest distinct token hashes per language
    * (`kmv_sketch`, a bounded TypedImperativeAggregate — ≤ 8k bytes per
    * group×partition where count_distinct shuffles every distinct
    * value), and the estimate is (k−1)·2⁶⁴ / kth_min, exact below k.
    * The exact count rides along so the artifact shows the error.
    */
  def kmvDistinct(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graft.{SketchAggregates, TextHashExpressions}
    // k = 16 ON PURPOSE: the synthetic vocabulary is ~31 tokens/lang, and
    // k below it makes the ESTIMATOR branch fire cross-engine — with
    // k = 64 every group would take the exact (<k) path and the kth-min
    // arithmetic would be a dead branch the oracle never checks
    val k = 16
    val num = (k - 1).toDouble * math.pow(2, 64)
    val toks = Tables.documents(s, dir)
      .select(col("lang"), explode(TextFunctions.tokens(col("text"))).as("t"))
    val unsignedKth = when(col("sk.kth") < 0,
      col("sk.kth").cast("double") + lit(math.pow(2, 64)))
      .otherwise(col("sk.kth").cast("double"))
    // mix64 on top of fnv: KMV is an ORDER-statistic consumer, and raw
    // FNV clusters prefix-sharing keys in unsigned order (measured 35×
    // estimate error on sequential keys — see TextHashOps.mix64)
    toks.groupBy(col("lang"))
      .agg(SketchAggregates.kmvSketch(
             TextHashExpressions.mix64(TextHashExpressions.fnv64(col("t"))), k).as("sk"),
           countDistinct(col("t")).as("n_exact"))
      .withColumn("n_kmv", when(col("sk.n") < k, col("sk.n").cast("long"))
        .otherwise(floor(lit(num) / unsignedKth).cast("long")))
      .select(col("lang"), col("n_exact"), col("n_kmv"))
  }

  /** Two-level KMV sketch rollup — the SKETCH-TABLE workflow q105's
    * one-shot form doesn't exercise: per (lang, source) the portable
    * `kmv_hashes` array (the ≤ k retained minimum hashes — what a
    * production pipeline WRITES per partition/day), then per lang a
    * `kmv_union` re-roll of the stored arrays into the summary sketch.
    * The union's k minimum distinct hashes are provably contained in
    * the union of per-group k-min lists, so the re-rolled estimate is
    * BIT-EQUAL to q105's single-pass estimate at the same k — the
    * invariant that lets a 100 TB corpus answer distinct-counts over
    * arbitrary group unions from k·groups stored longs, never
    * re-scanning raw data. The exact per-language count rides along as
    * the gate.
    *
    * Engine shape: one corpus-scale aggregate (bounded ≤ 8k-byte state
    * per group×partition), then a groups-sized aggregate over sketch
    * arrays — the second level never touches the corpus.
    */
  def kmvRollup(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graft.{SketchAggregates, TextHashExpressions}
    val k = 16 // below the ~31-token vocabulary so the estimator branch fires (q105)
    val num = (k - 1).toDouble * math.pow(2, 64)
    val toks = Tables.documents(s, dir)
      .select(col("lang"), col("source"), explode(TextFunctions.tokens(col("text"))).as("t"))
    val perSource = toks.groupBy(col("lang"), col("source"))
      .agg(SketchAggregates.kmvHashes(
        TextHashExpressions.mix64(TextHashExpressions.fnv64(col("t"))), k).as("sk_hashes"))
    val exact = toks.groupBy(col("lang")).agg(countDistinct(col("t")).as("n_exact"))
    val unsignedKth = when(col("sk.kth") < 0,
      col("sk.kth").cast("double") + lit(math.pow(2, 64)))
      .otherwise(col("sk.kth").cast("double"))
    perSource.groupBy(col("lang"))
      .agg(SketchAggregates.kmvUnion(col("sk_hashes"), k).as("sk"),
        count(lit(1)).as("n_sources"))
      .join(exact, Seq("lang"))
      .withColumn("n_kmv", when(col("sk.n") < k, col("sk.n").cast("long"))
        .otherwise(floor(lit(num) / unsignedKth).cast("long")))
      .select(col("lang"), col("n_sources"), col("n_exact"), col("n_kmv"))
  }

  /** Quantiles from a mergeable histogram sketch — the DISTRIBUTION
    * member of the sketch-table family (KMV q105/q120 = distinct, CMS
    * q112 = frequency, group-MinHash q123 = similarity): per
    * (lang, source) a fixed 64-bin equi-width count array over
    * `n_chars` (`hist_sketch` — what a production pipeline WRITES per
    * partition/day), re-rolled per language by `hist_merge`
    * (element-wise addition, so the rollup is BIT-equal to a
    * single-pass sketch over the raw rows — counts are additive over
    * disjoint row sets). p50/p95 are then read from cumulative counts
    * with rank interpolation inside the landing bin, ENTIRELY in
    * integer `div` arithmetic (micro units), so the estimate replays
    * exactly in SQL — unlike t-digest/KLL there is no float to drift.
    * The exact rank statistics (the ceil(q·n)-th smallest values) ride
    * along as the gate; `HistSketchSpec` pins |est − exact| ≤ width.
    *
    * Engine shape: one corpus-scale partial aggregate (512-byte state
    * per group×partition), a groups-sized re-roll that never touches
    * the corpus, and a nBins-sized read side — where the exact leg
    * sorts every row per group. At 100 TB the exact leg is dropped and
    * arbitrary group-union quantiles are answered from k·groups stored
    * longs.
    */
  def histQuantile(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graft.SketchAggregates
    val (lo, w, nBins) = (0L, 16L, 64)
    val docs = Tables.documents(s, dir)
      .select(col("lang"), col("source"), col("doc_id"), col("n_chars"))
    // level 1: the stored sketch table — one 512-byte array per (lang, source)
    val perSource = docs.groupBy(col("lang"), col("source"))
      .agg(SketchAggregates.histSketch(col("n_chars"), lo, w, nBins).as("hist"))
    // level 2: re-roll per lang from stored arrays (corpus never re-read)
    val rolled = perSource.groupBy(col("lang"))
      .agg(SketchAggregates.histMerge(col("hist"), nBins).as("hist"),
           count(lit(1)).as("n_sources"))
    val bins = rolled.select(col("lang"), col("n_sources"),
      posexplode(col("hist")).as(Seq("bin", "cnt")))
    val wCum = Window.partitionBy(col("lang")).orderBy(col("bin"))
    val cum = bins
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy(col("lang"))))
      .withColumn("r50", expr("(n + 1) div 2"))
      .withColumn("r95", expr("(19 * n + 19) div 20"))
    // landing bin per quantile: smallest non-empty bin with cum ≥ rank
    // (struct min is lexicographic and bin leads, so min picks it)
    def landing(r: org.apache.spark.sql.Column) =
      min(when(col("cum") >= r && col("cnt") > 0,
        struct(col("bin"), (col("cum") - col("cnt")).as("cb"), col("cnt").as("c"))))
    val picked = cum.groupBy(col("lang"))
      .agg(max(col("n")).as("n_docs"), max(col("n_sources")).as("n_sources"),
           max(col("r50")).as("r50"), max(col("r95")).as("r95"),
           landing(col("r50")).as("b50"), landing(col("r95")).as("b95"))
      .withColumn("p50_hist_micro",
        (lit(lo) + col("b50.bin") * lit(w)) * lit(1000000L) +
          expr(s"(${w * 1000000L} * (r50 - b50.cb)) div b50.c"))
      .withColumn("p95_hist_micro",
        (lit(lo) + col("b95.bin") * lit(w)) * lit(1000000L) +
          expr(s"(${w * 1000000L} * (r95 - b95.cb)) div b95.c"))
    // exact leg (the gate a 100 TB run drops): value at rank ceil(q·n)
    val wRank = Window.partitionBy(col("lang"))
      .orderBy(col("n_chars").asc, col("doc_id").asc)
    val ranked = docs.withColumn("rn", row_number().over(wRank))
    val e50 = ranked.join(picked.select(col("lang"), col("r50")), Seq("lang"))
      .filter(col("rn") === col("r50"))
      .select(col("lang"), col("n_chars").as("p50_exact"))
    val e95 = ranked.join(picked.select(col("lang"), col("r95")), Seq("lang"))
      .filter(col("rn") === col("r95"))
      .select(col("lang"), col("n_chars").as("p95_exact"))
    picked.join(e50, Seq("lang")).join(e95, Seq("lang"))
      .select(col("lang"), col("n_docs"), col("n_sources"),
        col("p50_exact"), col("p50_hist_micro"),
        col("p95_exact"), col("p95_hist_micro"))
  }

  /** Rendezvous (HRW) shard layout under expansion —
    * [[graft.operators.Sharding]] over the corpus at N=8 and N=9
    * shards: per new-layout shard, the doc count and how many docs
    * MOVED. The HRW invariant this exhibits (and `ShardingSpec` proves
    * key-by-key): growing N → N+1 moves only keys won by the NEW shard
    * — n_moved is 0 for every surviving shard and ≈ n/(N+1) for the
    * new one, where modulo hashing would re-home (N−1)/N of the corpus.
    * That is the difference between re-shuffling 11% and 89% of 100 TB
    * when a shard is added to the layout.
    *
    * Scale shape: pure map-side column arithmetic (N seeded mixes + one
    * array_max per row) feeding one aggregate — no join, no lookup
    * table, no driver state; assignment is a pure function of (id, N),
    * so producers and consumers agree without coordination.
    */
  def rendezvousShards(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(col("doc_id"),
        graft.operators.Sharding.rendezvousShard(col("doc_id"), 8).as("s8"),
        graft.operators.Sharding.rendezvousShard(col("doc_id"), 9).as("s9"))
      .groupBy(col("s9").as("shard"))
      .agg(count(lit(1)).as("n_docs"),
           count(when(col("s8") =!= col("s9"), 1)).as("n_moved"))
      .select(col("shard"), col("n_docs"), col("n_moved"))

  /** Count-min sketch heavy hitters — KMV's frequency-side sibling
    * (`cms_sketch`, a fixed 4×64-counter TypedImperativeAggregate):
    * token counts estimated from ONE 2 KiB mergeable array instead of a
    * per-key shuffle, the estimator production pipelines use for
    * vocabulary/heavy-hitter passes where the key space (n-grams, URLs,
    * hosts) is too wide to count exactly. Estimates are
    * `min_i counters[i][mix64(h XOR seed_i) mod w]` — never under, over
    * by the lightest bucket's collision mass — and every intermediate is
    * integer arithmetic over the shared fnv64/mix64 dag, so the whole
    * sketch replays exactly in SQL (like q105, unlike HLL). The exact
    * top-20 rides along so the artifact shows the collision error the
    * 64-wide rows actually incur at this vocabulary.
    *
    * Scale shape: the sketch build is one partial-aggregating pass
    * (depth·width longs per partition, merged on the driver side of a
    * 1-row agg); the exact leg exists only to gate the estimate and is
    * the piece a 100 TB run drops.
    */
  def cmsTopk(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graft.{SketchAggregates, TextHashExpressions}
    val (depth, width) = (4, 64)
    val toks = Tables.documents(s, dir)
      .select(explode(TextFunctions.tokens(col("text"))).as("t"))
    val exact = toks.groupBy(col("t")).agg(count(lit(1)).as("n_exact"))
    val top = exact.orderBy(col("n_exact").desc, col("t").asc).limit(20)
    val sk = toks.agg(SketchAggregates.cmsSketch(
      TextHashExpressions.fnv64(col("t")), depth, width).as("sk"))
    top.crossJoin(broadcast(sk))
      .withColumn("n_cms", SketchAggregates.cmsEstimate(
        col("sk"), TextHashExpressions.fnv64(col("t")), depth, width))
      .select(col("t"), col("n_exact"), col("n_cms"))
  }

  /** Weighted sample without replacement — sequential Poisson sampling
    * (Ohlsson): per-language, the 5 documents with the smallest
    * priority `u / weight`, u the doc_id's mix64 mapped to [0, 2⁶⁴) and
    * weight = n_chars, so inclusion probability is ∝ length. This is
    * the deterministic, mergeable form of weighted reservoir sampling
    * (Efraimidis–Spirakis with the exponential key replaced by the
    * division-only priority — no transcendentals, so the IEEE dag is
    * one signed→double cast, one add, one divide, identical
    * cross-engine). The curation use: picking quality-weighted or
    * length-weighted training subsets reproducibly across runs,
    * engines, and partitionings.
    *
    * Scale shape: priorities are map-side arithmetic; the per-stratum
    * top-5 is one rank over lang — at a real corpus the window becomes
    * a bounded per-partition top-k + merge, which the same priority
    * column serves unchanged (priorities are comparable across
    * partitions by construction).
    */
  def weightedSample(s: SparkSession, dir: String): DataFrame =
    weightedSampleDocs(Tables.documents(s, dir), col("n_chars"), 5)

  /** [[weightedSample]]'s core over any (lang, doc_id) frame and weight
    * column — exposed for the spec's planted-weight fixtures. */
  private[graft] def weightedSampleDocs(docs: DataFrame,
                                        weight: org.apache.spark.sql.Column,
                                        k: Int): DataFrame = {
    import org.apache.spark.sql.graft.TextHashExpressions
    val m = TextHashExpressions.mix64(col("doc_id"))
    val u = when(m < 0, m.cast("double") + lit(math.pow(2, 64)))
      .otherwise(m.cast("double"))
    val w = Window.partitionBy(col("lang")).orderBy(col("p").asc, col("doc_id").asc)
    docs
      .withColumn("_w", weight.cast("double"))
      .filter(col("_w") > 0)
      .select(col("lang"), col("doc_id"), col("n_chars"), col("_w"))
      .withColumn("p", u / col("_w"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("lang"), col("doc_id"), col("n_chars"))
  }

  /** Collocation mining — the top-20 bigrams by LIFT
    * `n_total·c(w1w2) / (c(w1)·c(w2))` with support ≥ 5: q60 ranks raw
    * bigram counts, this ranks ASSOCIATION (a bigram whose parts rarely
    * occur apart scores high even at modest count) — the phrase-mining
    * signal tokenizer vocabularies and stop-phrase lists are built
    * from. All counts stay exact integers; the one division happens
    * once per surviving bigram and is floored to the 1e-6 grid BEFORE
    * ranking, so the sort key is cross-engine exact.
    *
    * Scale shape: two hash aggregates (unigrams ≡ vocabulary, bigrams
    * support-filtered before any join), the two unigram-count joins key
    * on the vocabulary (broadcastable at any corpus size — vocabulary
    * grows sublinearly), and the grand total is a broadcast 1-row cross
    * join.
    */
  def collocations(s: SparkSession, dir: String): DataFrame =
    collocationsDocs(Tables.documents(s, dir), minSupport = 5, topN = 20)

  /** [[collocations]]'s core — exposed for the spec's planted-phrase
    * fixtures. */
  private[graft] def collocationsDocs(docs: DataFrame, minSupport: Int,
                                      topN: Int): DataFrame = {
    val uni = docs.select(explode(TextFunctions.tokens(col("text"))).as("u"))
      .groupBy(col("u")).agg(count(lit(1)).as("c"))
    val total = uni.agg(sum(col("c")).as("n_total"))
    val bi = docs
      .select(explode(TextFunctions.shingles(col("text"), 2)).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minSupport)
      .withColumn("w1", split(col("bigram"), " ").getItem(0))
      .withColumn("w2", split(col("bigram"), " ").getItem(1))
    bi.join(uni.select(col("u").as("w1"), col("c").as("c_a")), "w1")
      .join(uni.select(col("u").as("w2"), col("c").as("c_b")), "w2")
      .crossJoin(broadcast(total))
      .withColumn("lift",
        floor((col("n_total") * col("n_ab")).cast("double") /
          (col("c_a") * col("c_b")).cast("double") * 1e6) / 1e6)
      .orderBy(col("lift").desc, col("w1").asc, col("w2").asc)
      .limit(topN)
      .select(col("w1"), col("w2"), col("n_ab"), col("lift"))
  }

  /** PII redaction — the APPLY step of [[piiScan]]'s triage (scan tells
    * you what's there; this one rewrites it): emails → `<EMAIL>`, URLs
    * → `<URL>`, then 8+-letter runs → `<LW>`, applied in that order so
    * a placeholder never re-matches a later pattern. Per affected doc:
    * redaction count and the md5 of the redacted text — the rewrite
    * itself is hash-checked cross-engine, mirroring q97's
    * reconstruction contract. (As with q53, the synthetic corpus has no
    * emails/URLs — those legs gate the plumbing at zero and the
    * long-word leg keeps the oracle non-vacuous; the spec plants real
    * emails/URLs to exercise all three.) Pure map-side: three
    * codegen'd regex rewrites, no shuffle at all before the output.
    */
  def piiRedact(s: SparkSession, dir: String): DataFrame =
    piiRedactDocs(Tables.documentsWide(s, dir))

  /** [[piiRedact]]'s core — exposed for the spec's planted-PII docs. */
  private[graft] def piiRedactDocs(docs: DataFrame): DataFrame = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val url = "https?://[A-Za-z0-9./_-]+"
    val longWord = "[A-Za-z]{8,}"
    // The match-count gate is the regex-heavy half of the query; wrap it
    // in the placement barrier so Catalyst cannot push the Filter (and
    // with it all three regexp_extract_all evaluations) back below the
    // scan-parallelism floor's exchange onto the single scan task — see
    // [[org.apache.spark.sql.graft.BarrierExpressions.optBarrier]].
    docs.select(col("doc_id"), col("text"))
      .withColumn("t1", regexp_replace(col("text"), email, "<EMAIL>"))
      .withColumn("t2", regexp_replace(col("t1"), url, "<URL>"))
      .withColumn("n_redacted",
        org.apache.spark.sql.graft.BarrierExpressions.optBarrier(
          (size(regexp_extract_all(col("text"), lit(email), lit(0))) +
           size(regexp_extract_all(col("t1"), lit(url), lit(0))) +
           size(regexp_extract_all(col("t2"), lit(longWord), lit(0)))).cast("long")))
      .filter(col("n_redacted") > 0)
      .select(col("doc_id"), col("n_redacted"),
        md5(regexp_replace(col("t2"), longWord, "<LW>")).as("redacted_md5"))
  }

  /** Temperature-based language rebalancing (the mC4/XLM-R α-sampling
    * scheme): sample language l with probability ∝ n_l^α so
    * low-resource languages are UP-weighted relative to their corpus
    * share — the knob multilingual pretraining turns so English doesn't
    * drown everything else. α = 0.5 keeps the arithmetic exact across
    * engines (IEEE sqrt is correctly rounded; a libm pow is not), and
    * the normalizer Σ√n_l folds in LANG-SORTED order on both sides, so
    * per-language acceptance thresholds are bit-identical doubles
    * floored to integers. Documents accept by content-independent
    * doc-id hash against the integer threshold — reproducible across
    * runs, engines, and partitionings.
    *
    * Per language: corpus count, sampled count (target corpus = half
    * the input), and the ppm threshold. Unlike [[weightedMix]] (fixed
    * per-source tiers) the rate here is SELF-CALIBRATING — it derives
    * from the measured language distribution, so the same call
    * rebalances any corpus. Engine shape: one tiny counts aggregate →
    * 1-row model → broadcast threshold join → map-side accept; the
    * corpus-sized pass shuffles only for the final per-language rollup.
    */
  def alphaSample(s: SparkSession, dir: String): DataFrame =
    alphaSampleStats(Tables.documents(s, dir))

  /** [[alphaSample]]'s core — exposed for the spec's planted-skew and
    * exact-threshold checks. */
  private[graft] def alphaSampleStats(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.graft.TextHashExpressions
    val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_l"))
    val model = counts.agg(
      expr("sum(n_l) div 2").as("t"),
      aggregate(array_sort(collect_list(struct(col("lang"), col("n_l")))),
        lit(0.0),
        (acc, x) => acc + sqrt(x.getField("n_l").cast("double"))).as("s_sum"))
    val thr = counts.crossJoin(broadcast(model))
      .withColumn("threshold",
        floor(least(lit(1.0),
          col("t").cast("double") * sqrt(col("n_l").cast("double"))
            / col("s_sum") / col("n_l").cast("double")) * 1e6).cast("long"))
      .select(col("lang"), col("threshold"))
    docs.join(broadcast(thr), Seq("lang"))
      .withColumn("accept",
        pmod(TextHashExpressions.fnv64(col("doc_id").cast("string")),
          lit(1000000L)) < col("threshold"))
      .groupBy(col("lang"), col("threshold"))
      .agg(count(lit(1)).as("n_docs"),
           count(when(col("accept"), 1)).as("n_sampled"))
      .select(col("lang"), col("n_docs"), col("n_sampled"), col("threshold"))
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

  /** [[sequencePack]]'s SCALE mode: packing runs per (lang, shard) with
    * shard = content-hash mod nShards, so the per-stratum cumulative
    * window — whose parallelism is otherwise bounded by the number of
    * languages (5 cores busy on a 5-language corpus regardless of
    * cluster size) — fans out across nShards × languages partitions.
    * Bins never span shards, so the packing stays embarrassingly
    * parallel BY CONSTRUCTION and per-shard bin counts simply add; the
    * price is ≤ nShards−1 extra partially-filled bins per language
    * (the boundary waste every sharded packer pays). nShards = 1 is
    * spec'd identical to [[sequencePack]].
    */
  def sequencePackSharded(s: SparkSession, dir: String, nShards: Int): DataFrame = {
    import org.apache.spark.sql.graft.TextHashExpressions
    val binTokens = 2048L
    val shard =
      if (nShards <= 1) lit(0L)
      else pmod(TextHashExpressions.fnv64(col("text")), lit(nShards.toLong))
    val w = Window.partitionBy(col("lang"), col("_shard"))
      .orderBy(TextHashExpressions.fnv64(col("text")).asc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(s, dir)
      .withColumn("_shard", shard)
      .withColumn("n_tok", TextFunctions.tokenCount(col("text")).cast("long"))
      .withColumn("cum_before", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .withColumn("splits", when(col("n_tok") > 0,
        expr(s"(cum_before + n_tok - 1) div $binTokens - cum_before div $binTokens"))
        .otherwise(lit(0L)))
      .groupBy(col("lang"), col("_shard"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n_tok")).as("total_tokens"),
           expr(s"(sum(n_tok) + ${binTokens - 1}) div $binTokens").as("n_bins"),
           count(when(col("splits") > 0, 1)).as("n_boundary_docs"))
      .groupBy(col("lang"))
      .agg(sum(col("n_docs")).as("n_docs"),
           sum(col("total_tokens")).as("total_tokens"),
           sum(col("n_bins")).as("n_bins"),
           sum(col("n_boundary_docs")).as("n_boundary_docs"))
  }

  /** Real subword-tokenizer accounting: greedy longest-match BPE over
    * the embedded merge vocab ([[TextFunctions.bpeTokenCount]] — a
    * WordPiece-style fold, not the regex proxy), per language, next to
    * the whitespace-token count for compression-ratio context. This is
    * the token arithmetic a training pipeline budgets with; the oracle
    * replays the identical greedy fold in SQL (list_reduce with the
    * same bit-packed cursor), so the gate pins every consumed piece.
    */
  def bpeTokenStats(s: SparkSession, dir: String): DataFrame =
    Tables.documentsWide(s, dir)
      .withColumn("n_bpe", TextFunctions.bpeTokenCount(col("text")))
      .withColumn("n_ws", TextFunctions.tokenCount(col("text")).cast("long"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n_bpe")).as("total_subword_tokens"),
           sum(col("n_ws")).as("total_ws_tokens"))

  /** Unigram-LM surprisal quality filter (the CCNet/KenLM-style
    * perplexity gate, over a corpus-trained unigram model): token
    * surprisal is −log₂ p(t) with add-one smoothing, quantized to HALF
    * BITS through exact integer arithmetic — surprisal(t) =
    * (bitlength(q²) − 1) / 2 where q = (N+V) div (c+1) — because libm
    * log() differs across engines while binary digit counts (Spark
    * `conv`, DuckDB `bin`) are exact integer functions both sides. q is
    * clamped at 2³¹−1 (a ≥31.5-bit surprisal is beyond any filter
    * threshold; the clamp keeps q² inside BIGINT at any corpus size).
    * Per document: mean token surprisal, floor-quantized at 1e-6 (tie-free
    * cross-engine); per language: docs, exact-decimal average, and the
    * count over the filter threshold — the rows a quality gate drops.
    *
    * Scale shape: the model build is one token groupBy (map-side
    * partial aggregation); the scoring join is vocab-sized and hint-free
    * — AQE broadcasts it while it fits and falls back to a shuffle
    * equi-join when the vocabulary outgrows broadcast range (same
    * designed flip as q55's decontamination index).
    */
  def unigramSurprisal(s: SparkSession, dir: String): DataFrame =
    unigramSurprisalPerDoc(Tables.documents(s, dir))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
           davg(col("surprisal")).as("avg_surprisal"),
           count(when(col("surprisal") > 4.6, 1)).as("n_flagged"))

  /** Per-document mean token surprisal over the corpus-trained unigram
    * model (see [[unigramSurprisal]] for the arithmetic contract) —
    * exposed for the spec's hand-walked values. */
  private[graft] def unigramSurprisalPerDoc(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("t"))
    val vocab = toks.groupBy(col("t")).agg(count(lit(1)).as("c"))
    val totals = vocab.agg(sum(col("c")).as("n_total"), count(lit(1)).as("n_vocab"))
    val bits = vocab.crossJoin(broadcast(totals))
      .withColumn("q", least(expr("(n_total + n_vocab) div (c + 1)"), lit(2147483647L)))
      .withColumn("hb",
        (length(conv((col("q") * col("q")).cast("string"), 10, 2)) - 1).cast("long"))
      .select(col("t"), col("hb"))
    val perDoc = toks.join(bits, Seq("t"))
      .groupBy(col("doc_id"))
      .agg(sum(col("hb")).as("sum_hb"), count(lit(1)).as("n_tok"))
    docs.select(col("doc_id"), col("lang"))
      .join(perDoc, Seq("doc_id"), "left")
      .withColumn("surprisal", when(col("n_tok").isNull, lit(0.0))
        .otherwise(floor(col("sum_hb").cast("double") / (col("n_tok") * 2) * 1e6) / 1e6))
  }

  /** Bigram-conditional surprisal — the stronger LM quality gate next
    * to [[unigramSurprisal]]'s unigram model: token surprisal is
    * −log₂ p(t|u) for each adjacent pair (u,t), add-one smoothed over
    * the UNIGRAM vocabulary — p(t|u) = (c(u,t)+1)/(c(u)+V) — so unseen
    * continuations cost ~log₂(c(u)+V) bits and formulaic text (high
    * c(u,t)/c(u)) scores low. A conditional model separates fluent
    * common-word documents from shuffled ones the unigram gate scores
    * identically (unigram surprisal is permutation-invariant; bigram
    * surprisal is exactly what detects scrambled or templated text).
    *
    * Same exact-integer half-bit quantization as q90: surprisal(u,t) =
    * (bitlength(q²)−1)/2 with q = (c(u)+V) div (c(u,t)+1) clamped at
    * 2³¹−1 — binary digit counts are exact on both engines where libm
    * log is not. Context counts c(u) sum the bigram counts per context
    * (so both counts come off ONE bigram aggregate, and the last token
    * of each document — which conditions nothing — is consistently
    * excluded). Per document: mean over its n_tok−1 bigrams, floor-
    * quantized at 1e-6; docs with <2 tokens surprise 0.
    *
    * Scale shape: the model build is one bigram groupBy (map-side
    * partial agg — bigram vocab ≪ corpus bigram mass); the context
    * re-aggregate and the bits table are model-sized; the scoring join
    * is corpus-bigrams ⋈ bigram-vocab, hint-free — AQE broadcasts the
    * model while it fits and flips to a shuffle equi-join when the
    * bigram vocabulary outgrows broadcast range (the q55/q90 designed
    * flip).
    */
  def bigramSurprisal(s: SparkSession, dir: String): DataFrame =
    bigramSurprisalPerDoc(Tables.documents(s, dir))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
           davg(col("surprisal")).as("avg_surprisal"),
           count(when(col("surprisal") > 4.75, 1)).as("n_flagged"))

  /** Per-document mean bigram surprisal (see [[bigramSurprisal]] for
    * the arithmetic contract) — exposed for the spec's hand-walked
    * values. Tokens are whitespace-split so the space-joined bigram
    * key splits back unambiguously (`substring_index(b, ' ', 1)` IS
    * the context token). */
  private[graft] def bigramSurprisalPerDoc(docs: DataFrame): DataFrame = {
    val bi = docs.select(col("doc_id"),
      explode(TextFunctions.shingles(col("text"), 2)).as("b"))
    val cb = bi.groupBy(col("b")).agg(count(lit(1)).as("c_ut"))
    val cu = cb.groupBy(substring_index(col("b"), " ", 1).as("u"))
      .agg(sum(col("c_ut")).as("c_u"))
    val vocab = docs
      .select(explode(TextFunctions.tokens(col("text"))).as("t"))
      .agg(count_distinct(col("t")).as("v"))
    val bits = cb.withColumn("u", substring_index(col("b"), " ", 1))
      .join(cu, Seq("u"))
      .crossJoin(broadcast(vocab))
      .withColumn("q", least(expr("(c_u + v) div (c_ut + 1)"), lit(2147483647L)))
      .withColumn("hb",
        (length(conv((col("q") * col("q")).cast("string"), 10, 2)) - 1).cast("long"))
      .select(col("b"), col("hb"))
    val perDoc = bi.join(bits, Seq("b"))
      .groupBy(col("doc_id"))
      .agg(sum(col("hb")).as("sum_hb"), count(lit(1)).as("n_bi"))
    docs.select(col("doc_id"), col("lang"))
      .join(perDoc, Seq("doc_id"), "left")
      .withColumn("surprisal", when(col("n_bi").isNull, lit(0.0))
        .otherwise(floor(col("sum_hb").cast("double") / (col("n_bi") * 2) * 1e6) / 1e6))
  }

  /** BM25 full-text retrieval: top-10 documents per query for an
    * embedded query set — the lexical leg of a retrieval/RAG pipeline
    * next to the embedding ANN family (q23/q24/q38). Standard BM25
    * (k₁=1.2, b=0.75) with the LOG-FREE BM25+ idf: ln(1+(N−df+0.5)/
    * (df+0.5)) is monotone in (N+1)/(df+0.5), so PER-TERM ordering is
    * preserved (a BM25-family scoring, not textbook-equivalent: the
    * monotone transform is per-term, so cross-document rankings of
    * multi-term score SUMS can differ from ln-idf BM25 when documents
    * match different terms) while every term score stays a fixed dag of
    * IEEE double ops that both engines evaluate bit-identically (ln is
    * libm-dependent — the q47 tf-idf precedent). Per-(query,doc) scores
    * sum order-independently
    * via [[ExactNum.fsum]]; ranking orders by that exact score with
    * doc_id as tie-break.
    *
    * Scale shape: the corpus-sized work is ONE (doc,term) groupBy; the
    * query-term join broadcasts (query sets are human-sized), so
    * per-query cost is independent of how many queries batch together.
    */
  def bm25TopDocs(s: SparkSession, dir: String): DataFrame =
    bm25Rank(Tables.documents(s, dir),
      s.createDataFrame(Bm25Queries).toDF("query_id", "t"))

  /** BM25 ranking core over an arbitrary (doc_id, text) corpus and
    * (query_id, t) term set — exposed for the spec's planted-relevance
    * checks. See [[bm25TopDocs]] for the scoring contract. */
  private[graft] def bm25Rank(docs: DataFrame, termsDf: DataFrame): DataFrame = {
    val perQD = bm25Scores(docs, termsDf)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id").asc)
    perQD.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 10)
      .select(col("query_id"), col("doc_id"), col("score"), col("rank"))
  }

  /** Unranked per-(query, doc) BM25 scores — the scoring core behind
    * [[bm25Rank]], factored out so [[hybridRetrieval]] can re-rank an
    * ANN shortlist with the identical arithmetic. Emits a row only for
    * docs matching ≥ 1 query term; df/avgdl statistics come from the
    * WHOLE `docs` relation passed in, not any shortlist. */
  private[graft] def bm25Scores(docs: DataFrame, termsDf: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("t"))
    val tf = toks.groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("tf"))
    // tf rows are unique per (doc, term), so a plain count IS df
    val dfreq = tf.join(broadcast(termsDf.select(col("t")).distinct()), Seq("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("df"))
    val dl = docs.select(col("doc_id"),
      TextFunctions.tokenCount(col("text")).cast("double").as("dl"))
    val stats = docs.agg(count(lit(1)).as("n_docs"),
      sum(TextFunctions.tokenCount(col("text")).cast("long")).as("total_tok"))
    val scored = tf.join(broadcast(termsDf), Seq("t"))
      .join(broadcast(dfreq), Seq("t"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      // operation order mirrors the oracle SQL exactly (IEEE determinism)
      .withColumn("tscore",
        (col("n_docs").cast("double") + lit(1.0)) / (col("df").cast("double") + lit(0.5)) *
          (col("tf").cast("double") * lit(2.2)) /
          (col("tf").cast("double") + lit(1.2) *
            (lit(0.25) + lit(0.75) *
              (col("dl") / (col("total_tok").cast("double") / col("n_docs"))))))
    scored.groupBy(col("query_id"), col("doc_id"))
      .agg(fsum(col("tscore")).as("score"))
  }

  /** The embedded BM25 query set — shared between the Spark form and the
    * oracle's VALUES literal. */
  private[graft] val Bm25Queries: Seq[(Long, String)] = Seq(
    (1L, "spark"), (1L, "stream"), (1L, "join"),
    (2L, "fast"), (2L, "table"), (2L, "scan"),
    (3L, "vector"), (3L, "hash"), (3L, "window"))

  /** Hybrid retrieval (q107): ANN shortlist → lexical re-rank — the
    * retrieve-then-rank shape a RAG pipeline actually runs, composed
    * from the gated legs (q23's exact ANN, q91's BM25) instead of gated
    * only leg-by-leg. Corpus = documents ⋈ embeddings on id (the rows
    * that have BOTH modalities); each query carries an embedding (its
    * own corpus vector) and a term set (the shared [[Bm25Queries]]);
    * the shortlist is the embedding-cosine top-50, re-ranked by BM25
    * score (exact [[ExactNum.fsum]] arithmetic, corpus-level df/avgdl —
    * never shortlist-level), cosine order breaking lexical ties (so
    * term-free shortlist docs keep their ANN order below every
    * term-matching doc).
    *
    * Scale shape: both legs keep their own scale stories (broadcast
    * queries over one corpus stream; one (doc, term) groupBy) and the
    * fusion join touches |queries|·shortlist rows only. The
    * planted-relevance recall gate is HybridRetrievalSpec's.
    */
  def hybridRetrieval(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    val corpus = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      .join(emb, col("doc_id") === col("vec_id"))
      .select(col("doc_id"), col("text"), col("embedding"))
    val queryVecs = emb.filter(col("vec_id").isin(1L, 2L, 3L))
      .select(col("vec_id").as("query_id"), col("embedding"))
    val queryTerms = s.createDataFrame(Bm25Queries).toDF("query_id", "t")
    // the brute shortlist leg keeps q107 exactly SQL-replayable (the
    // oracle's CTE is the 100%-scan cosine top-50); the ANN default is
    // the production path, gated by HybridRetrievalSpec's planted test
    hybridTopK(queryVecs, queryTerms, corpus, k = 10, shortlistSize = 50,
      shortlist = Similarity.bruteForceTopK)
  }

  /** The composable core of [[hybridRetrieval]] over arbitrary inputs:
    * `queryVecs` (query_id, embedding), `queryTerms` (query_id, t),
    * `corpus` (doc_id, text, embedding). Output (query_id, doc_id,
    * rank, score): rank 1..k per query, score = exact BM25 (0.0 for
    * shortlist docs matching no term). The shortlist leg is PLUGGABLE,
    * defaulting to [[Similarity.annShortlist]] (IVF-PQ — the 100 TB
    * path: per-query work n^(-1/4) of the corpus); q107's oracle twin
    * passes [[Similarity.bruteForceTopK]] explicitly. Both emit exact
    * re-ranked cosines, so the BM25 fusion arithmetic is identical —
    * only shortlist membership can differ (by 1 − recall, gated in
    * HybridRetrievalSpec's planted test over the ANN leg). */
  private[graft] def hybridTopK(queryVecs: DataFrame, queryTerms: DataFrame,
                                corpus: DataFrame, k: Int,
                                shortlistSize: Int,
                                shortlist: (DataFrame, DataFrame, Int) => DataFrame =
                                  Similarity.annShortlist): DataFrame = {
    val ann = shortlist(queryVecs,
        corpus.select(col("doc_id").as("vec_id"), col("embedding")), shortlistSize)
      .select(col("query_id"), col("neighbor_id").as("doc_id"), col("cosine"))
    val lex = bm25Scores(corpus.select(col("doc_id"), col("text")), queryTerms)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("cosine").desc, col("doc_id").asc)
    ann.join(lex, Seq("query_id", "doc_id"), "left")
      .withColumn("score", coalesce(col("score"), lit(0.0)))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("rank"), col("score"))
  }

  /** URL canonicalization + alias dedup (q109) — the crawl-curation
    * step upstream of every content hash: the same page's URL arrives
    * with scheme/host case noise, a `www.` prefix, an explicit default
    * port, tracking parameters, shuffled parameter order, and fragments;
    * [[TextFunctions.canonicalizeUrl]] collapses all of it and this
    * query groups by the canonical form (alias count + first doc id —
    * the keep-lowest-id rule every dedup here uses). URLs are
    * synthesized deterministically from (doc_id, source) — the wrapWav/
    * wrapAvi discipline for corpora without the real payload — with
    * every noise axis exercised by residue classes of doc_id.
    *
    * Scale shape: canonicalization is one map-side codegen'd
    * projection; the only shuffle is the fixed-width (canonical_url)
    * group-by with map-side partial aggregation.
    */
  /** The deterministic noisy-URL synthesizer q109/q134 share: every
    * alias axis (scheme/www/host case, root dot, :80, percent-encoding,
    * empty path, utm + param order, fragment) as doc_id residue classes.
    */
  private def syntheticUrl: org.apache.spark.sql.Column = concat(
      when(col("doc_id") % 2 === 0, lit("HTTP")).otherwise(lit("http")),
      lit("://"),
      when(col("doc_id") % 3 === 0, lit("WWW.")).otherwise(lit("")),
      col("source"), lit(".Example.COM"),
      // FQDN root dot: example.com. ≡ example.com
      when(col("doc_id") % 11 === 0, lit(".")).otherwise(lit("")),
      when(col("doc_id") % 5 === 0, lit(":80")).otherwise(lit("")),
      // empty path for one residue class (the '?'-before-any-'/' case);
      // percent-encoding noise in the rest: %6f/%6F ≡ 'o' (unreserved
      // decode + hex-case fold)
      when(col("doc_id") % 9 === 0, lit(""))
        .when(col("doc_id") % 13 === 0, concat(lit("/D%6fcs/"), (col("doc_id") % 100).cast("string")))
        .when(col("doc_id") % 13 === 1, concat(lit("/D%6Fcs/"), (col("doc_id") % 100).cast("string")))
        .otherwise(concat(lit("/Docs/"), (col("doc_id") % 100).cast("string"))),
      when(col("doc_id") % 4 === 0, lit("?utm_source=feed&b=2&a=1"))
        .when(col("doc_id") % 4 === 1, lit("?a=1&b=2"))
        .when(col("doc_id") % 4 === 2, lit("?b=2&a=1"))
        .otherwise(lit("")),
      when(col("doc_id") % 7 === 0, lit("#frag")).otherwise(lit("")))

  def urlDedup(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), TextFunctions.canonicalizeUrl(syntheticUrl).as("canonical_url"))
      .groupBy(col("canonical_url"))
      .agg(count(lit(1)).as("n_aliases"), min(col("doc_id")).as("first_doc_id"))

  /** Host-level crawl aggregation (q134) — the curation decision a
    * crawl pipeline takes per HOST, not per page: canonical-alias
    * collapse rate, distinct-language spread, and byte mass, with a
    * deterministic integer dup-rate (ppm) that gates spammy hosts.
    * One map-side canonicalization projection, one host-keyed rollup;
    * the distinct counts ride the same exchange (expand-based
    * multi-distinct, no second shuffle).
    */
  def hostStats(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        TextFunctions.canonicalizeUrl(syntheticUrl).as("url"))
      .withColumn("host", regexp_extract(col("url"), "^[a-z]+://([^/]+)", 1))
      .groupBy(col("host"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("url")).as("n_unique_urls"),
        countDistinct(col("lang")).as("n_langs"),
        sum(col("n_chars")).as("total_chars"))
      .withColumn("dup_ppm",
        floor(((col("n_docs") - col("n_unique_urls")) * lit(1000000L)) /
          col("n_docs").cast("double")).cast("long"))
      .withColumn("is_spammy", col("dup_ppm") > lit(500000L))

  /** HTML text extraction (q111): deterministic HTML is synthesized
    * around each document (title, style/script blocks with embedded
    * `<`, the document text, and an entity gauntlet), then
    * [[TextFunctions.extractHtmlText]] recovers the prose — md5 of the
    * extracted text is the cross-engine contract (the q97/q100
    * rewritten-text discipline). Map-side end to end; the only shuffle
    * is none (per-row projection).
    */
  def htmlExtract(s: SparkSession, dir: String): DataFrame = {
    val html = concat(
      lit("<html><head><title>Doc "), col("doc_id"), lit("</title>"),
      lit("<style>p { color: red; }</style>"),
      lit("<script>var x = 1 < 2;</script></head>"),
      lit("<!-- hidden a > b comment --><body><h1>Doc "), col("doc_id"), lit("</h1><p>"),
      col("text"),
      lit("</p><p>5 &lt; 6 &amp;&amp; 7 &gt; 3 &quot;q&quot; &apos;a&apos;&nbsp;end</p>"),
      // numeric-reference gauntlet: decimal + hex decode (&#65;=A,
      // &#x42;=B, &#x7a;=z), excluded ampersand (&#38;lt; → literal
      // &lt;), out-of-ASCII refs pass through intact, double-encoded
      // &amp;#65; stays single-decoded
      lit("<p>&#65;&#x42;&#x7a; n &#38;lt; a &#8217; u &#x1F600; e &amp;#65; d 100%zz</p></body></html>"))
    Tables.documentsWide(s, dir)
      .select(col("doc_id"),
        TextFunctions.extractHtmlText(html).as("extracted"))
      .select(col("doc_id"), md5(col("extracted").cast("binary")).as("text_md5"),
        length(col("extracted")).cast("long").as("n_chars"))
  }

  /** BPE merge-rule learning (q130) — six merge iterations of
    * [[graft.operators.Bpe.learnMerges]] over the corpus word-frequency
    * dictionary. The oracle unrolls the same six iterations as CTEs
    * (pair explode → weighted argmax → `replace`-rewrite), so the
    * learned rules, their tie-breaks, AND their corpus-weighted counts
    * are all checked cross-engine.
    */
  def bpeLearn(s: SparkSession, dir: String): DataFrame =
    graft.operators.Bpe.learnMerges(Tables.documents(s, dir), "text", numMerges = 6)

  /** BPE fertility by language (q135) — subwords-per-token of the q130
    * tokenizer, the standard "how well does this vocab fit each
    * language" evaluation (fertility ≈ 1 means most words stay whole;
    * high fertility = the language pays more sequence length per word).
    * Reads per-word symbol counts off the served word→symbols map
    * ([[graft.operators.Bpe.vocabAfter]]) and weights by per-language
    * token counts — corpus-scale work is two token groupBys; everything
    * else is vocabulary-sized.
    */
  def bpeFertility(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val vocab = graft.operators.Bpe.vocabAfter(docs, "text", numMerges = 6)
      .select(col("w"), size(split(col("symbols"), "  ")).as("n_sym"))
    val lw = docs.select(col("lang"),
        explode(TextFunctions.tokens(col("text"))).as("w"))
      .groupBy(col("lang"), col("w")).agg(count(lit(1)).as("c"))
    lw.join(vocab, "w")
      .groupBy(col("lang"))
      .agg(sum(col("c")).as("n_tokens"),
        sum(col("c") * col("n_sym")).as("n_subwords"))
      .withColumn("fertility_ppm",
        floor((col("n_subwords") * lit(1000000.0)) / col("n_tokens"))
          .cast("long"))
  }

  /** Held-out BPE fertility (q146) — the tokenizer generalization
    * measurement a training pipeline actually reads: merges are LEARNED
    * on the q46 'train' split alone and APPLIED FROZEN
    * ([[graft.operators.Bpe.encodeWith]], the serve path) to the 'test'
    * split, whose per-language fertility (subwords per token) then
    * measures how well the learned rules transfer to unseen text —
    * q135's number on the training corpus itself cannot see
    * over-fitting of the merge table. Unseen held-out words segment to
    * characters plus whatever learned merges apply, the standard BPE
    * open-vocabulary contract.
    *
    * Scale shape: identical to q135 (one word-dictionary aggregate per
    * slice, merge replay over the vocabulary only) — the split
    * predicate is map-side on the shared fnv64 bucket.
    */
  def bpeHeldout(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graft.TextHashExpressions
    val docs = Tables.documents(s, dir)
    val bucket = TextHashExpressions.fnv64(col("text"))
      .bitwiseAND(lit(0x7FFFFFFFL)) % 100
    val train = docs.filter(bucket < 80)
    val heldout = docs.filter(bucket >= 90)
    val merges = graft.operators.Bpe.learnMerges(train, "text", numMerges = 6)
      .collect().sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val vocab = graft.operators.Bpe.encodeWith(heldout, "text", merges)
      .select(col("w"), size(split(col("symbols"), "  ")).as("n_sym"))
    val lw = heldout.select(col("lang"),
        explode(TextFunctions.tokens(col("text"))).as("w"))
      .groupBy(col("lang"), col("w")).agg(count(lit(1)).as("c"))
    lw.join(vocab, "w")
      .groupBy(col("lang"))
      .agg(sum(col("c")).as("n_tokens"),
        sum(col("c") * col("n_sym")).as("n_subwords"))
      .withColumn("fertility_ppm",
        floor((col("n_subwords") * lit(1000000.0)) / col("n_tokens"))
          .cast("long"))
  }

  /** Deterministic mixture schedule (q136) — the data-mixing step that
    * turns per-source weights into a reproducible global training
    * order: within each source, docs take a content-hash rank (q61's
    * deterministic order); a doc's schedule position is
    * floor(rank·10⁶ / weight), so a weight-3 source emits 3× as densely
    * as a weight-1 source (stride interleave — the GPT-3-style mixture
    * without RNG state). Output: the first 100 scheduled docs.
    * Scale shape: per-source window + TakeOrdered(100) — no global
    * sort materializes; the final row_number runs on 100 rows.
    */
  def mixSchedule(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graft.TextHashExpressions
    val docs = Tables.documents(s, dir)
      .withColumn("weight", (length(col("source")) % 3 + 1).cast("long"))
    val wSrc = Window.partitionBy(col("source"))
      .orderBy(TextHashExpressions.fnv64(col("text")).asc, col("doc_id").asc)
    val pos = docs.withColumn("rn", row_number().over(wSrc).cast("long"))
      .withColumn("sched_pos",
        floor((col("rn") * lit(1000000.0)) / col("weight")).cast("long"))
    val top = pos.orderBy(col("sched_pos").asc, col("source").asc,
      col("doc_id").asc).limit(100)
    top.withColumn("train_order", row_number().over(
        Window.orderBy(col("sched_pos").asc, col("source").asc, col("doc_id").asc)))
      .select(col("train_order"), col("doc_id"), col("source"), col("rn"),
        col("sched_pos"))
  }

  /** Dataset card (q141) — the per-source corpus report a data release
    * ships: volume (docs/tokens/chars), exact-duplicate mass (distinct
    * full-text fingerprints vs rows, as integer ppm), and language
    * spread. One rollup with the distinct count riding the same
    * exchange; every output column integer-exact.
    */
  def datasetCard(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graft.TextHashExpressions
    Tables.documents(s, dir)
      .select(col("source"), col("lang"), col("n_chars"),
        TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"),
        TextHashExpressions.fnv64(col("text")).as("fh"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("fh")).as("n_unique_texts"),
        countDistinct(col("lang")).as("n_langs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(col("n_chars")).as("total_chars"))
      .withColumn("dup_ppm",
        floor(((col("n_docs") - col("n_unique_texts")) * lit(1000000L)) /
          col("n_docs").cast("double")).cast("long"))
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

  /** Context-window chunking ([[graft.operators.Chunking]]): 500-char
    * chunks with 100-char overlap; emits offsets + an md5 content hash
    * per chunk so the oracle pins the exact slicing, not just counts.
    */
  def chunkDocs(s: SparkSession, dir: String): DataFrame =
    graft.operators.Chunking.chunk(Tables.documents(s, dir), "text", 500, 100)
      .select(col("doc_id"),
        col("chunk_index").cast("long").as("chunk_index"),
        col("chunk_start"),
        length(col("chunk_text")).cast("long").as("n_chunk_chars"),
        md5(col("chunk_text").cast("binary")).as("chunk_md5"))

  /** Pareto frontier (skyline) over (length, quality): the documents no
    * other same-language document strictly dominates on BOTH n_chars
    * and quality score — the "longest high-quality exemplars" set a
    * curation pipeline keeps when it can't threshold either axis alone.
    * Computed with TWO window maxima instead of the naive O(n²)
    * dominance self-join: over `ORDER BY n_chars`, `max(q)` over the
    * strictly-longer suffix (RANGE 1 FOLLOWING → ∞) detects
    * ⟨longer, ≥quality⟩ dominators and `max(q)` over the ≥-length
    * suffix (RANGE CURRENT ROW → ∞, self included so self never
    * strictly exceeds) detects ⟨≥length, >quality⟩ ones. One exchange
    * on lang, one sort, both frames off the same window — linear scan,
    * no join, which is what lets the skyline run at corpus scale.
    */
  def qualitySkyline(s: SparkSession, dir: String): DataFrame =
    skyline2d(
      Tables.documents(s, dir)
        .select(col("lang"), col("doc_id"), col("n_chars"),
          TextFunctions.qualityScore(col("text")).as("quality")),
      part = "lang", x = "n_chars", y = "quality")
      .select(col("lang"), col("doc_id"), col("n_chars"), col("quality"))

  /** [[qualitySkyline]]'s core: rows of `df` not strictly dominated on
    * (x maximize, y maximize) within their `part` group — exposed for
    * the spec's brute-force dominance cross-check. `x` must be an
    * integer column (it keys the RANGE frames).
    *
    * The suffix maxima are phrased as GROWING frames on a DESCENDING
    * sort (`RANGE UNBOUNDED PRECEDING → {1 PRECEDING | CURRENT ROW}`),
    * which Spark's `UnboundedPrecedingWindowFunctionFrame` maintains
    * incrementally in O(n) per partition. The naive suffix phrasing
    * (`RANGE {1 FOLLOWING | CURRENT ROW} → UNBOUNDED FOLLOWING` on an
    * ascending sort) is SEMANTICALLY identical but executes via
    * `UnboundedFollowingWindowFunctionFrame`, which re-aggregates the
    * whole remaining suffix for every row — O(n²) per partition:
    * measured 0.37 s → 4.66 s → 292 s across sf0.1/sf1/sf10 (63× for
    * the last 10×) before the rewrite, vs linear after. Same one
    * exchange + one sort; only the frame direction changes.
    */
  private[graft] def skyline2d(df: DataFrame, part: String, x: String,
                               y: String): DataFrame = {
    val byXDesc = Window.partitionBy(col(part)).orderBy(col(x).desc)
    // descending order: "preceding" = larger x, so [-∞, -1] = x > current
    // and [-∞, current row] = x ≥ current (peers included by RANGE)
    val strictlyGreater = byXDesc.rangeBetween(Window.unboundedPreceding, -1L)
    val atLeast = byXDesc.rangeBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("mq_longer", max(col(y)).over(strictlyGreater))
      .withColumn("mq_geq", max(col(y)).over(atLeast))
      .filter((col("mq_longer").isNull || col("mq_longer") < col(y)) &&
        !(col("mq_geq") > col(y)))
      .drop("mq_longer", "mq_geq")
  }

  /** Spell-pair mining — the SymSpell deletion-neighborhood join,
    * distributed: every vocabulary word expands to its ≤2-deletion
    * variants (the word, len one-deletes, len·(len−1)/2 two-deletes),
    * candidate pairs are words SHARING a variant (an equi-join on the
    * variant key — if lev(a,b) ≤ 2 the neighborhoods provably
    * intersect), and survivors are verified with one levenshtein per
    * DISTINCT candidate pair. This is the typo/variant-collapse pass a
    * tokenizer-vocabulary build runs; the naive form is a vocabulary
    * cross join (|V|² edit distances), this form is |V|·O(len²)
    * map-side expansion + a hash join + |candidates| verifications —
    * and the vocabulary grows sublinearly in corpus size, so the whole
    * operator is corpus-scale-safe by construction.
    */
  def spellPairs(s: SparkSession, dir: String): DataFrame =
    spellPairsVocab(
      Tables.documents(s, dir)
        .select(explode(TextFunctions.tokens(col("text"))).as("w"))
        .filter(length(col("w")) >= 3 && col("w").rlike("^[a-z]+$"))
        .groupBy(col("w")).agg(count(lit(1)).as("c"))
        .filter(col("c") >= 3),
      maxDist = 2)

  /** [[spellPairs]]'s core over any (w, c) vocabulary — exposed for the
    * spec's planted-typo fixtures. `maxDist` ≤ 2 (the neighborhood is
    * built from ≤2 deletions, so deeper distances would lose recall).
    */
  private[graft] def spellPairsVocab(vocab: DataFrame, maxDist: Int): DataFrame = {
    require(maxDist >= 1 && maxDist <= 2,
      s"maxDist must be 1 or 2 (deletion neighborhood depth), got $maxDist")
    val w = col("w")
    val del1 = transform(sequence(lit(1), length(w)),
      i => concat(w.substr(lit(1), i - lit(1)), w.substr(i + lit(1), length(w))))
    val del2 = flatten(transform(sequence(lit(1), length(w) - lit(1)),
      i => transform(sequence(i + lit(1), length(w)),
        j => concat(w.substr(lit(1), i - lit(1)),
          w.substr(i + lit(1), j - i - lit(1)),
          w.substr(j + lit(1), length(w))))))
    val variants =
      if (maxDist == 1) concat(array(w), del1)
      else concat(array(w), del1, del2)
    val expanded = vocab.select(col("w"), col("c"), explode(variants).as("v"))
    val a = expanded.select(col("w").as("w1"), col("c").as("c1"), col("v"))
    val b = expanded.select(col("w").as("w2"), col("c").as("c2"), col("v"))
    a.join(b, Seq("v"))
      .filter(col("w1") < col("w2"))
      .select(col("w1"), col("w2"), col("c1"), col("c2"))
      .distinct()
      .withColumn("dist", levenshtein(col("w1"), col("w2")).cast("long"))
      .filter(col("dist") <= maxDist)
  }

  /** Held-out trigram language-model surprisal with stupid backoff —
    * the CCNet-style perplexity filter: counts come from the TRAIN
    * split (q46's content-hash bucket < 80), scoring runs over the
    * held-out TEST split (bucket ≥ 90), so unseen n-grams actually
    * occur and the backoff chain is exercised on real data. Surprisal
    * stays integer-exact cross-engine via the q90/q96 surrogate — the
    * inverted probability `q = (context + V) // (count + 1)` costs
    * `bitlength(q²) − 1` half-bits — and each backoff level adds a
    * fixed 4 half-bits (the 0.25 stupid-backoff penalty, exactly 2
    * bits, kept integral). Per language: docs scored, mean surprisal,
    * docs flagged over threshold, and the trigram/bigram/unigram hit
    * mix (the diagnostic that tells you whether the model or the
    * corpus moved).
    *
    * Engine shape: three train-side count tables (trigram ~O(tokens),
    * bigram/unigram sublinear), five equi-joins keyed on them, and a
    * broadcast 1-row (V, n_total) model. At real scale the count
    * tables get a min-count prune before the join (the standard KenLM
    * trim) — the join shape is unchanged.
    */
  def trigramSurprisal(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graft.TextHashExpressions
    val bucket = TextHashExpressions.fnv64(col("text"))
      .bitwiseAND(lit(0x7FFFFFFFL)) % 100
    val docs = Tables.documents(s, dir).withColumn("bucket", bucket)
    trigramSurprisalSplit(
      train = docs.filter(col("bucket") < 80),
      test = docs.filter(col("bucket") >= 90),
      flagThreshold = 5.0)
  }

  /** [[trigramSurprisal]]'s core over an explicit (train, test) split —
    * exposed for the spec's hand-walked backoff fixtures. Both frames
    * need (doc_id, lang, text). */
  private[graft] def trigramSurprisalSplit(train: DataFrame, test: DataFrame,
                                           flagThreshold: Double): DataFrame = {
    val triTr = train.select(explode(TextFunctions.shingles(col("text"), 3)).as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("c_uvw"))
    val biTr = train.select(explode(TextFunctions.shingles(col("text"), 2)).as("b"))
      .groupBy(col("b")).agg(count(lit(1)).as("c_b"))
    val uniTr = train.select(explode(TextFunctions.tokens(col("text"))).as("u"))
      .groupBy(col("u")).agg(count(lit(1)).as("c_u"))
    val model = uniTr.agg(sum(col("c_u")).as("n_total"), count(lit(1)).as("v"))

    // q clamped at 2³¹−1 (q90's contract: keeps q² inside BIGINT);
    // half-bit cost = bitlength(q²) − 1, exact on both engines
    val halfBits = (qExpr: String) => {
      val q = least(expr(qExpr), lit(2147483647L))
      (length(conv((q * q).cast("string"), 10, 2)) - 1).cast("long")
    }
    // Round-15 note: the §2.3 "score the distinct trigrams, then attach
    // to occurrences on one key" restructure was implemented,
    // oracle-verified row-identical, measured at three scales — and
    // REJECTED: sf0.1 1.03× (everything broadcasts), sf1 0.85×
    // (consistent loss: the extra distinct exchange isn't bought back),
    // sf10 neutral (8 clean per-pass samples per side: mins 16.9 vs
    // 16.6 s, medians ~32 vs ~28 — inside q117's heavy-tailed band).
    // The per-occurrence form stays.
    val tri = test.select(col("doc_id"),
        explode(TextFunctions.shingles(col("text"), 3)).as("g"))
      .withColumn("prefix", concat_ws(" ",
        split(col("g"), " ").getItem(0), split(col("g"), " ").getItem(1)))
      .withColumn("suffix", concat_ws(" ",
        split(col("g"), " ").getItem(1), split(col("g"), " ").getItem(2)))
      .withColumn("w2", split(col("g"), " ").getItem(1))
      .withColumn("w3", split(col("g"), " ").getItem(2))
    val scored = tri
      .join(triTr, Seq("g"), "left")
      .join(biTr.select(col("b").as("prefix"), col("c_b").as("c_uv")), Seq("prefix"), "left")
      .join(biTr.select(col("b").as("suffix"), col("c_b").as("c_vw")), Seq("suffix"), "left")
      .join(uniTr.select(col("u").as("w2"), col("c_u").as("c_w2")), Seq("w2"), "left")
      .join(uniTr.select(col("u").as("w3"), col("c_u").as("c_w3")), Seq("w3"), "left")
      .crossJoin(broadcast(model))
      .withColumn("level",
        when(col("c_uvw").isNotNull, lit(3))
          .when(col("c_vw").isNotNull, lit(2))
          .otherwise(lit(1)))
      .withColumn("hb",
        when(col("level") === 3,
          halfBits("(c_uv + v) div (c_uvw + 1)"))
          .when(col("level") === 2,
            halfBits("(c_w2 + v) div (c_vw + 1)") + 4L)
          .otherwise(
            halfBits("(n_total + v) div (coalesce(c_w3, 0) + 1)") + 8L))
    val perDoc = scored.groupBy(col("doc_id"))
      .agg(sum(col("hb")).as("sum_hb"), count(lit(1)).as("n_tri"),
        count(when(col("level") === 3, 1)).as("tri_hits"),
        count(when(col("level") === 2, 1)).as("bi_hits"),
        count(when(col("level") === 1, 1)).as("uni_hits"))
    test.select(col("doc_id"), col("lang"))
      .join(perDoc, Seq("doc_id"), "left")
      .withColumn("surprisal",
        when(col("sum_hb").isNull, lit(0.0))
          .otherwise(floor(col("sum_hb").cast("double") /
            (col("n_tri") * 2) * 1e6) / 1e6))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        davg(col("surprisal")).as("avg_surprisal"),
        count(when(col("surprisal") > flagThreshold, 1)).as("n_flagged"),
        coalesce(sum(col("tri_hits")), lit(0L)).as("n_tri_hits"),
        coalesce(sum(col("bi_hits")), lit(0L)).as("n_bi_hits"),
        coalesce(sum(col("uni_hits")), lit(0L)).as("n_uni_hits"))
  }

  /** Inverted-index materialization: per term with df ≥ 5 — document
    * frequency, collection frequency, and the first 8 postings
    * (ascending doc_ids, comma-joined) — the build step of a BM25/
    * boolean serving index (q91 scores on the fly; this one writes the
    * artifact a search tier loads). The posting lists are BOUNDED
    * before collection: a row_number over (term → doc_id) marks the
    * head, and only rank ≤ 8 doc_ids enter the collect (collect_list
    * skips the nulls), so no executor ever buffers a stopword's full
    * posting list — the invariant that keeps index builds alive on a
    * 100 TB corpus. The window and the final aggregate share the same
    * hash partitioning on term (one exchange, reused).
    */
  def invertedIndex(s: SparkSession, dir: String): DataFrame =
    invertedIndexDocs(Tables.documents(s, dir), minDf = 5, k = 8)

  /** [[invertedIndex]]'s core — exposed for the spec's planted-postings
    * fixtures. */
  private[graft] def invertedIndexDocs(docs: DataFrame, minDf: Int,
                                       k: Int): DataFrame = {
    val tf = docs
      .select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("term"))
      .groupBy(col("term"), col("doc_id")).agg(count(lit(1)).as("tf"))
    val w = Window.partitionBy(col("term")).orderBy(col("doc_id").asc)
    tf.withColumn("rn", row_number().over(w))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"),
        sum(col("tf")).as("cf"),
        concat_ws(",",
          array_sort(collect_list(when(col("rn") <= k, col("doc_id"))))
            .cast("array<string>")).as("head_postings"))
      .filter(col("df") >= minDf)
  }

  /** Shared q109/q134 oracle plumbing: the CTE chain raw -> p7 that
    * re-derives (doc_id, canonical_url) from the synthetic noisy URLs
    * entirely in DuckDB SQL (percent-fold + unreserved decode + scheme/
    * host/port/path/query/fragment normalization + utm strip + param
    * sort). Callers append their own final SELECT over `p7`.
    */
  private def urlCanonOracleCtes: String = {
      // uppercase-fold the two hex digits after each '%' (piece 1 of the
      // split never follows a '%')
      val foldSql = "array_to_string(list_transform(string_split(nofrag, '%'), " +
        "(x, i) -> CASE WHEN i = 1 THEN x " +
        "WHEN regexp_matches(x, '^[0-9a-fA-F]{2}') " +
        "THEN '%' || upper(substr(x, 1, 2)) || substr(x, 3) " +
        "ELSE '%' || x END), '')"
      // decode the unreserved set — generated from the same table as
      // the engine's replace chain, applied in the same order
      val decodeSql = graft.functions.TextFunctions.UnreservedDecodes
        .foldLeft(foldSql) { case (acc, (e, v)) =>
          s"replace($acc, '$e', '$v')"
        }
      s"""raw AS (SELECT doc_id,
         |  (CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'http' END) || '://' ||
         |  (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END) ||
         |  source || '.Example.COM' ||
         |  (CASE WHEN doc_id % 11 = 0 THEN '.' ELSE '' END) ||
         |  (CASE WHEN doc_id % 5 = 0 THEN ':80' ELSE '' END) ||
         |  (CASE WHEN doc_id % 9 = 0 THEN ''
         |        WHEN doc_id % 13 = 0 THEN '/D%6fcs/' || CAST(doc_id % 100 AS VARCHAR)
         |        WHEN doc_id % 13 = 1 THEN '/D%6Fcs/' || CAST(doc_id % 100 AS VARCHAR)
         |        ELSE '/Docs/' || CAST(doc_id % 100 AS VARCHAR) END) ||
         |  (CASE WHEN doc_id % 4 = 0 THEN '?utm_source=feed&b=2&a=1'
         |        WHEN doc_id % 4 = 1 THEN '?a=1&b=2'
         |        WHEN doc_id % 4 = 2 THEN '?b=2&a=1' ELSE '' END) ||
         |  (CASE WHEN doc_id % 7 = 0 THEN '#frag' ELSE '' END) AS url
         | FROM documents),
         |p0 AS (SELECT doc_id, split_part(url, '#', 1) AS nofrag FROM raw),
         |p1 AS (SELECT doc_id, $decodeSql AS nofrag FROM p0),
         |p2 AS (SELECT doc_id, nofrag,
         |  split_part(nofrag, '://', 1) AS scheme FROM p1),
         |p3 AS (SELECT doc_id, scheme,
         |  substr(nofrag, length(scheme) + 4) AS hostpathq FROM p2),
         |p4 AS (SELECT doc_id, scheme, hostpathq,
         |  split_part(hostpathq, '?', 1) AS hostpath,
         |  CASE WHEN contains(hostpathq, '?')
         |       THEN substr(hostpathq, length(split_part(hostpathq, '?', 1)) + 2)
         |       ELSE '' END AS query FROM p3),
         |p5 AS (SELECT doc_id, scheme, query,
         |  split_part(hostpath, '/', 1) AS hostport,
         |  CASE WHEN contains(hostpath, '/')
         |       THEN substr(hostpath, length(split_part(hostpath, '/', 1)) + 2)
         |       ELSE '' END AS path FROM p4),
         |p6 AS (SELECT doc_id, scheme, query, path,
         |  regexp_replace(regexp_replace(
         |    lower(split_part(hostport, ':', 1)), '^www\\.', ''), '\\.+$$', '') ||
         |  CASE WHEN contains(hostport, ':')
         |        AND substr(hostport, length(split_part(hostport, ':', 1)) + 2) NOT IN ('', '80')
         |       THEN ':' || substr(hostport, length(split_part(hostport, ':', 1)) + 2)
         |       ELSE '' END AS host FROM p5),
         |p7 AS (SELECT doc_id, lower(scheme) || '://' || host || '/' || path ||
         |  CASE WHEN len(pp) > 0 THEN '?' || array_to_string(pp, '&') ELSE '' END
         |    AS canonical_url
         | FROM (SELECT doc_id, scheme, host, path,
         |   list_sort(list_filter(string_split(query, '&'),
         |     p -> NOT starts_with(p, 'utm_') AND p <> '')) AS pp FROM p6))"""
      .stripMargin
  }

  /** q130/q135 shared oracle plumbing: word-frequency dict → six
    * unrolled BPE merge iterations (pair explode → weighted argmax →
    * `replace` rewrite; both engines' replace scans left-to-right and
    * resumes after a replacement — BPE's leftmost-non-overlapping
    * rule). v6 carries (w, s, cnt): the served word→symbols tokenizer.
    * Each rewrite is a LEFT JOIN against the 1-row argmax with a
    * COALESCE fallback: on a degenerate corpus that exhausts mergeable
    * pairs before step 6, m$k is empty and the vocabulary must pass
    * through UNCHANGED (the engine's learnMerges skips such steps) —
    * an inner join would empty v$k and every later step.
    */
  private def bpeOracleCtes(src: String = "documents"): String = {
    val iters = (1 to 6).map { k =>
      s"""p$k AS (SELECT pr[1] AS l, pr[2] AS r, cnt FROM (
         |  SELECT unnest([[t[i], t[i+1]] for i in range(1, len(t))]) AS pr, cnt
         |  FROM (SELECT str_split(trim(s), '  ') AS t, cnt FROM v${k - 1}) z)),
         |m$k AS (SELECT l, r, pc FROM (
         |  SELECT l, r, CAST(SUM(cnt) AS BIGINT) AS pc FROM p$k GROUP BY l, r)
         |  ORDER BY pc DESC, l, r LIMIT 1),
         |v$k AS (SELECT w, COALESCE(replace(s, ' ' || m.l || '  ' || m.r || ' ',
         |    ' ' || m.l || m.r || ' '), s) AS s, cnt
         |  FROM v${k - 1} LEFT JOIN m$k m ON TRUE)""".stripMargin
    }.mkString(",\n")
    s"""wc AS (SELECT w, COUNT(*) AS cnt FROM (
       |  SELECT unnest(${toksSql("text")}) AS w FROM $src) u GROUP BY w),
       |v0 AS (SELECT w, regexp_replace(w, '(.)', ' \\1 ', 'g') AS s, cnt FROM wc),
       |$iters""".stripMargin
  }

  /** q146's serve-side replay: the FROZEN m1..m6 rules (from
    * [[bpeOracleCtes]]'s train-slice argmaxes) applied in rank order to
    * a DIFFERENT corpus's word dictionary — the same LEFT JOIN/COALESCE
    * pass-through when a train step exhausted early.
    */
  private def bpeApplyCtes(src: String): String = {
    val iters = (1 to 6).map { k =>
      s"""h$k AS (SELECT w, COALESCE(replace(s, ' ' || m.l || '  ' || m.r || ' ',
         |    ' ' || m.l || m.r || ' '), s) AS s, cnt
         |  FROM h${k - 1} LEFT JOIN m$k m ON TRUE)""".stripMargin
    }.mkString(",\n")
    s"""hw AS (SELECT w, COUNT(*) AS cnt FROM (
       |  SELECT unnest(${toksSql("text")}) AS w FROM $src) u GROUP BY w),
       |h0 AS (SELECT w, regexp_replace(w, '(.)', ' \\1 ', 'g') AS s, cnt FROM hw),
       |$iters""".stripMargin
  }

  private[queries] def textOracles: Map[String, String] = Map(
    "q130_bpe_learn" -> {
      val out = (1 to 6).map { k =>
        s"""SELECT $k AS step, l AS "left", r AS "right", l || r AS merged,
           | pc AS pair_count FROM m$k""".stripMargin
      }.mkString(" UNION ALL ")
      s"""WITH ${bpeOracleCtes()}
         |$out""".stripMargin
    },
    // fertility reads per-word subword counts off v6 (the served
    // tokenizer) and weights them by per-language token counts; the
    // ppm is the same mult-then-divide floor both engines run in IEEE
    "q135_bpe_fertility" ->
      s"""WITH ${bpeOracleCtes()},
         |sym AS (SELECT w, len(str_split(trim(s), '  ')) AS n_sym FROM v6),
         |lw AS (SELECT lang, w, COUNT(*) AS c FROM (
         |  SELECT lang, unnest(${toksSql("text")}) AS w FROM documents) u
         | GROUP BY lang, w),
         |a AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS n_tokens,
         |   CAST(SUM(c * n_sym) AS BIGINT) AS n_subwords
         |  FROM lw JOIN sym USING (w) GROUP BY lang)
         |SELECT lang, n_tokens, n_subwords,
         | CAST(FLOOR(n_subwords * 1000000.0 / CAST(n_tokens AS DOUBLE)) AS BIGINT)
         |   AS fertility_ppm
         |FROM a""".stripMargin,
    // held-out fertility: merges learned on the q46 train slice alone
    // (the m1..m6 argmaxes see only train words), then applied FROZEN
    // to the test slice's word dictionary via the h-chain
    "q146_bpe_heldout" -> {
      def slice(cond: String) =
        s"(SELECT * FROM documents WHERE (${fnvSql("text")} & 2147483647) % 100 $cond)"
      s"""WITH ${bpeOracleCtes(slice("< 80"))},
         |${bpeApplyCtes(slice(">= 90"))},
         |sym AS (SELECT w, len(str_split(trim(s), '  ')) AS n_sym FROM h6),
         |lw AS (SELECT lang, w, COUNT(*) AS c FROM (
         |  SELECT lang, unnest(${toksSql("text")}) AS w
         |  FROM ${slice(">= 90")} ho) u
         | GROUP BY lang, w),
         |a AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS n_tokens,
         |   CAST(SUM(c * n_sym) AS BIGINT) AS n_subwords
         |  FROM lw JOIN sym USING (w) GROUP BY lang)
         |SELECT lang, n_tokens, n_subwords,
         | CAST(FLOOR(n_subwords * 1000000.0 / CAST(n_tokens AS DOUBLE)) AS BIGINT)
         |   AS fertility_ppm
         |FROM a""".stripMargin
    },
    "q141_dataset_card" ->
      s"""WITH t AS (SELECT source, lang, n_chars,
         |  CASE WHEN length(trim(text)) = 0 THEN 0
         |   ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
         |  ${fnvSql("text")} AS fh
         | FROM documents),
         |a AS (SELECT source, COUNT(*) AS n_docs,
         |  COUNT(DISTINCT fh) AS n_unique_texts,
         |  COUNT(DISTINCT lang) AS n_langs,
         |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
         |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
         | FROM t GROUP BY source)
         |SELECT source, n_docs, n_unique_texts, n_langs, total_tokens,
         | total_chars,
         | CAST(FLOOR((n_docs - n_unique_texts) * 1000000
         |   / CAST(n_docs AS DOUBLE)) AS BIGINT) AS dup_ppm
         |FROM a""".stripMargin,
    // stride-interleave replay: same per-source content-hash rank as
    // q61, same mult-then-divide position floor, same global tie order
    "q136_mix_schedule" ->
      s"""WITH h0 AS (SELECT doc_id, source, ${fnvSql("text")} AS ufh FROM documents),
         |d AS (SELECT doc_id, source, ${signedSql("ufh")} AS fh,
         |  CAST(length(source) % 3 + 1 AS BIGINT) AS weight FROM h0),
         |p AS (SELECT doc_id, source, weight,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY fh, doc_id)
         |    AS BIGINT) AS rn FROM d),
         |sp AS (SELECT doc_id, source, rn,
         |  CAST(FLOOR(rn * 1000000.0 / CAST(weight AS DOUBLE)) AS BIGINT)
         |    AS sched_pos FROM p)
         |SELECT * FROM (
         | SELECT CAST(ROW_NUMBER() OVER (ORDER BY sched_pos, source, doc_id)
         |    AS INT) AS train_order, doc_id, source, rn, sched_pos
         | FROM sp) t
         |WHERE train_order <= 100""".stripMargin,
    "q127_rendezvous_shards" -> {
      // the engine's array_max over (w, s) structs == unsigned-max weight
      // with ties to the higher shard index: ORDER BY w DESC, j DESC
      val seeds = (0 until 9).map(i => java.lang.Long.toUnsignedString(
        org.apache.spark.sql.graft.CmsSketch.rowSeed(i)))
      val xCols = seeds.zipWithIndex.map { case (sd, j) =>
        s"xor(CAST(doc_id AS UBIGINT), CAST('$sd' AS UBIGINT)) AS x$j" }.mkString(", ")
      val legs = (0 until 9).map(j =>
        s"SELECT doc_id, $j AS j, ${mixSql(s"x$j")} AS w FROM hx").mkString(" UNION ALL ")
      s"""WITH hx AS (SELECT doc_id, $xCols FROM documents),
         |l AS ($legs),
         |a9 AS (SELECT doc_id, j AS s9 FROM (
         |  SELECT doc_id, j, ROW_NUMBER() OVER
         |    (PARTITION BY doc_id ORDER BY w DESC, j DESC) AS rn FROM l)
         | WHERE rn = 1),
         |a8 AS (SELECT doc_id, j AS s8 FROM (
         |  SELECT doc_id, j, ROW_NUMBER() OVER
         |    (PARTITION BY doc_id ORDER BY w DESC, j DESC) AS rn FROM l WHERE j < 8)
         | WHERE rn = 1)
         |SELECT a9.s9 AS shard, COUNT(*) AS n_docs,
         | COUNT(CASE WHEN a8.s8 <> a9.s9 THEN 1 END) AS n_moved
         |FROM a9 JOIN a8 USING (doc_id) GROUP BY a9.s9""".stripMargin
    },
    "q124_hist_quantile" -> {
      // element-wise addition makes the (lang, source) → lang rollup
      // bit-equal to direct per-lang bin counts, so the oracle replays
      // the two-level workflow as one pass (same identity as q120)
      val (w, nBins) = (16L, 64)
      s"""WITH d AS (SELECT lang, source, doc_id, n_chars FROM documents),
         |c AS (SELECT lang, COUNT(*) AS n,
         |      COUNT(DISTINCT source) AS n_sources FROM d GROUP BY lang),
         |r AS (SELECT lang, n, n_sources,
         |      (n + 1) // 2 AS r50, (19 * n + 19) // 20 AS r95 FROM c),
         |b AS (SELECT lang,
         |      LEAST(GREATEST(n_chars // $w, 0), ${nBins - 1}) AS bin FROM d),
         |bc AS (SELECT lang, bin, COUNT(*) AS cnt FROM b GROUP BY lang, bin),
         |cu AS (SELECT lang, bin, cnt,
         |       SUM(cnt) OVER (PARTITION BY lang ORDER BY bin) AS cum FROM bc),
         |s50 AS (SELECT cu.lang, bin, cnt, cum - cnt AS cb,
         |        ROW_NUMBER() OVER (PARTITION BY cu.lang ORDER BY bin) AS k
         |        FROM cu JOIN r USING (lang) WHERE cum >= r50 AND cnt > 0),
         |s95 AS (SELECT cu.lang, bin, cnt, cum - cnt AS cb,
         |        ROW_NUMBER() OVER (PARTITION BY cu.lang ORDER BY bin) AS k
         |        FROM cu JOIN r USING (lang) WHERE cum >= r95 AND cnt > 0),
         |rk AS (SELECT lang, n_chars,
         |       ROW_NUMBER() OVER (PARTITION BY lang
         |                          ORDER BY n_chars, doc_id) AS rn FROM d),
         |e50 AS (SELECT rk.lang, n_chars AS p50_exact
         |        FROM rk JOIN r USING (lang) WHERE rn = r50),
         |e95 AS (SELECT rk.lang, n_chars AS p95_exact
         |        FROM rk JOIN r USING (lang) WHERE rn = r95)
         |SELECT r.lang, r.n AS n_docs, r.n_sources,
         | e50.p50_exact,
         | CAST(f50.bin * $w * 1000000 +
         |      (${w * 1000000L} * (r.r50 - f50.cb)) // f50.cnt AS BIGINT)
         |   AS p50_hist_micro,
         | e95.p95_exact,
         | CAST(f95.bin * $w * 1000000 +
         |      (${w * 1000000L} * (r.r95 - f95.cb)) // f95.cnt AS BIGINT)
         |   AS p95_hist_micro
         |FROM r
         |JOIN (SELECT * FROM s50 WHERE k = 1) f50 USING (lang)
         |JOIN (SELECT * FROM s95 WHERE k = 1) f95 USING (lang)
         |JOIN e50 USING (lang) JOIN e95 USING (lang)""".stripMargin
    },
    "q99_c4_filter" -> {
      val stops = TextFunctions.Stopwords.map(s => s"'$s'").mkString(", ")
      s"""WITH t AS (SELECT lang, text, ${toksSql("text")} AS w FROM documents),
         |f AS (SELECT lang, len(w) AS n_tok,
         |  CASE WHEN len(w) = 0 THEN 0.0
         |       ELSE 1.0 - CAST(len(list_distinct(w)) AS DOUBLE) / len(w) END AS dup_ratio,
         |  CASE WHEN len(w) = 0 THEN 0.0
         |       ELSE CAST(len(list_filter(w, t -> t IN ($stops))) AS DOUBLE) / len(w) END AS stop_ratio,
         |  CASE WHEN len(w) = 0 THEN 0.0
         |       ELSE CAST(list_sum(list_transform(w, t -> length(t))) AS DOUBLE) / len(w) END AS mean_wl,
         |  CASE WHEN length(text) = 0 THEN 0.0
         |       ELSE CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE)
         |            / length(text) END AS punct_ratio
         | FROM t),
         |g AS (SELECT lang, n_tok < 25 AS f_len, dup_ratio > 0.6 AS f_rep,
         |  stop_ratio < 0.02 AS f_stop, (mean_wl < 3.0 OR mean_wl > 5.0) AS f_wl,
         |  punct_ratio > 0.05 AS f_punct FROM f)
         |SELECT lang, COUNT(*) AS n_docs,
         | COUNT(CASE WHEN NOT f_len AND NOT f_rep AND NOT f_stop
         |            AND NOT f_wl AND NOT f_punct THEN 1 END) AS n_kept,
         | COUNT(CASE WHEN f_len THEN 1 END) AS n_fail_len,
         | COUNT(CASE WHEN f_rep THEN 1 END) AS n_fail_rep,
         | COUNT(CASE WHEN f_stop THEN 1 END) AS n_fail_stop,
         | COUNT(CASE WHEN f_wl THEN 1 END) AS n_fail_wordlen,
         | COUNT(CASE WHEN f_punct THEN 1 END) AS n_fail_punct
         |FROM g GROUP BY lang""".stripMargin
    },
    "q100_pii_redact" -> {
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val url = "https?://[A-Za-z0-9./_-]+"
      val longWord = "[A-Za-z]{8,}"
      s"""WITH r AS (SELECT doc_id, text,
         |  regexp_replace(text, '$email', '<EMAIL>', 'g') AS t1 FROM documents),
         |r2 AS (SELECT doc_id, text, t1,
         |  regexp_replace(t1, '$url', '<URL>', 'g') AS t2 FROM r),
         |n AS (SELECT doc_id, t2,
         |  CAST(len(regexp_extract_all(text, '$email'))
         |   + len(regexp_extract_all(t1, '$url'))
         |   + len(regexp_extract_all(t2, '$longWord')) AS BIGINT) AS n_redacted
         | FROM r2)
         |SELECT doc_id, n_redacted,
         | md5(regexp_replace(t2, '$longWord', '<LW>', 'g')) AS redacted_md5
         |FROM n WHERE n_redacted > 0""".stripMargin
    },
    "q105_kmv_distinct" -> {
      val k = 16
      val num = (k - 1).toDouble * math.pow(2, 64)
      val two64 = math.pow(2, 64)
      s"""WITH toks AS (SELECT lang, unnest(${toksSql("text")}) AS t FROM documents),
         |ex AS (SELECT lang, COUNT(DISTINCT t) AS n_exact FROM toks GROUP BY lang),
         |hf AS (SELECT DISTINCT lang, ${fnvSql("t")} AS hraw FROM toks),
         |hs AS (SELECT lang, ${mixSql("hraw")} AS hu FROM hf),
         |r AS (SELECT lang, hu,
         |  ROW_NUMBER() OVER (PARTITION BY lang ORDER BY hu) AS rn,
         |  COUNT(*) OVER (PARTITION BY lang) AS nh FROM hs),
         |kth AS (SELECT lang, MAX(CASE WHEN rn = $k THEN ${signedSql("hu")} END) AS hk,
         |        MAX(nh) AS nh
         |        FROM r WHERE rn <= $k GROUP BY lang)
         |SELECT ex.lang, ex.n_exact,
         | CASE WHEN kth.nh < $k THEN kth.nh
         |      ELSE CAST(FLOOR($num / (CAST(hk AS DOUBLE) +
         |             CASE WHEN hk < 0 THEN $two64 ELSE 0.0 END)) AS BIGINT) END AS n_kmv
         |FROM ex JOIN kth USING (lang)""".stripMargin
    },
    "q120_kmv_rollup" -> {
      // the union of per-source k-min lists carries the language's
      // global k minimum distinct hashes, so the oracle replays the
      // rollup as q105's direct global order statistics + n_sources
      val k = 16
      val num = (k - 1).toDouble * math.pow(2, 64)
      val two64 = math.pow(2, 64)
      s"""WITH toks AS (SELECT lang, source, unnest(${toksSql("text")}) AS t FROM documents),
         |ex AS (SELECT lang, COUNT(DISTINCT t) AS n_exact,
         |       COUNT(DISTINCT source) AS n_sources FROM toks GROUP BY lang),
         |hf AS (SELECT DISTINCT lang, ${fnvSql("t")} AS hraw FROM toks),
         |hs AS (SELECT lang, ${mixSql("hraw")} AS hu FROM hf),
         |r AS (SELECT lang, hu,
         |  ROW_NUMBER() OVER (PARTITION BY lang ORDER BY hu) AS rn,
         |  COUNT(*) OVER (PARTITION BY lang) AS nh FROM hs),
         |kth AS (SELECT lang, MAX(CASE WHEN rn = $k THEN ${signedSql("hu")} END) AS hk,
         |        MAX(nh) AS nh
         |        FROM r WHERE rn <= $k GROUP BY lang)
         |SELECT ex.lang, ex.n_sources, ex.n_exact,
         | CASE WHEN kth.nh < $k THEN kth.nh
         |      ELSE CAST(FLOOR($num / (CAST(hk AS DOUBLE) +
         |             CASE WHEN hk < 0 THEN $two64 ELSE 0.0 END)) AS BIGINT) END AS n_kmv
         |FROM ex JOIN kth USING (lang)""".stripMargin
    },
    "q112_cms_topk" -> {
      val (depth, width) = (4, 64)
      val seeds = (0 until depth).map(i => java.lang.Long.toUnsignedString(
        org.apache.spark.sql.graft.CmsSketch.rowSeed(i)))
      val xCols = seeds.zipWithIndex.map { case (sd, i) =>
        s"xor(hu, CAST('$sd' AS UBIGINT)) AS x$i" }.mkString(", ")
      val bCols = (0 until depth).map(i =>
        s"CAST(${mixSql(s"x$i")} % $width AS BIGINT) AS b$i").mkString(", ")
      val legs = (0 until depth).map(i =>
        s"SELECT t, $i AS i, b$i AS b FROM bk").mkString(" UNION ALL ")
      // counts per (row, bucket) replay as SUM of exact counts over the
      // distinct terms mapping there — identical to the engine's
      // per-occurrence increments by construction
      s"""WITH toks AS (SELECT unnest(${toksSql("text")}) AS t FROM documents),
         |ex AS (SELECT t, COUNT(*) AS n_exact FROM toks GROUP BY t),
         |top AS (SELECT t, n_exact FROM ex ORDER BY n_exact DESC, t LIMIT 20),
         |hd AS (SELECT t, ${fnvSql("t")} AS hu FROM (SELECT DISTINCT t FROM toks)),
         |hx AS (SELECT t, $xCols FROM hd),
         |bk AS (SELECT t, $bCols FROM hx),
         |tb AS ($legs),
         |cnt AS (SELECT i, b, SUM(n_exact) AS c FROM tb JOIN ex USING (t) GROUP BY i, b),
         |est AS (SELECT tb.t, CAST(MIN(c) AS BIGINT) AS n_cms
         |        FROM tb JOIN cnt USING (i, b) GROUP BY tb.t)
         |SELECT top.t AS t, top.n_exact, est.n_cms
         |FROM top JOIN est USING (t)""".stripMargin
    },
    "q113_weighted_sample" ->
      s"""WITH d AS (SELECT lang, doc_id, n_chars FROM documents WHERE n_chars > 0),
         |m AS (SELECT lang, doc_id, n_chars,
         |  ${mixSql("CAST(doc_id AS UBIGINT)")} AS mu FROM d),
         |sg AS (SELECT lang, doc_id, n_chars, ${signedSql("mu")} AS ms FROM m),
         |p AS (SELECT lang, doc_id, n_chars,
         |  (CAST(ms AS DOUBLE) +
         |   CASE WHEN ms < 0 THEN 18446744073709551616.0 ELSE 0.0 END)
         |  / CAST(n_chars AS DOUBLE) AS pr FROM sg)
         |SELECT lang, doc_id, n_chars FROM (
         | SELECT lang, doc_id, n_chars,
         |  ROW_NUMBER() OVER (PARTITION BY lang ORDER BY pr, doc_id) AS rn
         | FROM p) t WHERE rn <= 5""".stripMargin,
    "q114_collocations" ->
      s"""WITH t AS (SELECT ${toksSql("text")} AS w FROM documents),
         |uni AS (SELECT unnest(w) AS u FROM t),
         |ex AS (SELECT u, COUNT(*) AS c FROM uni GROUP BY u),
         |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n_total FROM ex),
         |b AS (SELECT unnest([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS bigram
         |      FROM t),
         |bc AS (SELECT bigram, COUNT(*) AS n_ab FROM b GROUP BY bigram
         |       HAVING COUNT(*) >= 5),
         |sp AS (SELECT bigram, n_ab, split_part(bigram, ' ', 1) AS w1,
         |       split_part(bigram, ' ', 2) AS w2 FROM bc),
         |j AS (SELECT sp.w1, sp.w2, sp.n_ab,
         |  FLOOR(CAST(tot.n_total * sp.n_ab AS DOUBLE)
         |        / CAST(ca.c * cb.c AS DOUBLE) * 1e6) / 1e6 AS lift
         | FROM sp JOIN ex ca ON ca.u = sp.w1
         |         JOIN ex cb ON cb.u = sp.w2 CROSS JOIN tot)
         |SELECT w1, w2, n_ab, lift FROM j
         |ORDER BY lift DESC, w1, w2 LIMIT 20""".stripMargin,
    "q102_quality_classifier" ->
      s"""WITH toks AS (SELECT lang, ${toksSql("text")} AS w FROM documents),
         |sc AS (SELECT lang, FLOOR((CASE WHEN len(w) = 0 THEN 0.0
         |  ELSE list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |    list_transform(w, t ->
         |      $classifierWeightsSql[CAST(${fnvSql("t")} % 64 AS INT) + 1])),
         |    (acc, x) -> acc + x) / len(w) END) * 1e6) / 1e6 AS score
         | FROM toks)
         |SELECT lang, COUNT(*) AS n_docs,
         | COUNT(CASE WHEN score >= -0.25 THEN 1 END) AS n_kept,
         | ${davgSql("score")} AS avg_score
         |FROM sc GROUP BY lang""".stripMargin,
    "q98_alpha_sample" ->
      s"""WITH c AS (SELECT lang, COUNT(*) AS n_l FROM documents GROUP BY lang),
         |m AS (SELECT CAST(SUM(n_l) AS BIGINT) // 2 AS t,
         |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |    list_transform(list(n_l ORDER BY lang), x -> sqrt(CAST(x AS DOUBLE)))),
         |    (a, b) -> a + b) AS s_sum
         |  FROM c),
         |thr AS (SELECT lang,
         |  CAST(FLOOR(LEAST(1.0, CAST(t AS DOUBLE) * sqrt(CAST(n_l AS DOUBLE))
         |    / s_sum / CAST(n_l AS DOUBLE)) * 1e6) AS BIGINT) AS threshold
         |  FROM c CROSS JOIN m),
         |u AS (SELECT lang, ${fnvSql("CAST(doc_id AS VARCHAR)")} AS uh FROM documents),
         |acc AS (SELECT u.lang, thr.threshold,
         |  ((${signedSql("uh")} % 1000000) + 1000000) % 1000000 < threshold AS accept
         |  FROM u JOIN thr USING (lang))
         |SELECT lang, COUNT(*) AS n_docs,
         | COUNT(CASE WHEN accept THEN 1 END) AS n_sampled, threshold
         |FROM acc GROUP BY lang, threshold""".stripMargin,
    "q81_chunking" ->
      """WITH n AS (
        | SELECT doc_id, text,
        |  CAST(ceil(GREATEST(length(text) - 100, 1) / 400.0) AS BIGINT) AS n_chunks
        | FROM documents),
        |e AS (SELECT doc_id, text, unnest(range(0, n_chunks)) AS i FROM n)
        |SELECT doc_id, i AS chunk_index, i * 400 AS chunk_start,
        | length(substring(text, CAST(i*400 + 1 AS INT), 500)) AS n_chunk_chars,
        | md5(substring(text, CAST(i*400 + 1 AS INT), 500)) AS chunk_md5
        |FROM e""".stripMargin,
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
    "q31_subword_stats" ->
      """SELECT lang, COUNT(*) AS n_docs,
        | CAST(SUM(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]'))) AS BIGINT) AS total_subwords
        |FROM documents GROUP BY lang""".stripMargin,
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
    "q53_pii_scan" ->
      """SELECT source, COUNT(*) AS n_docs,
        | COUNT(CASE WHEN regexp_matches(text,
        |   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}') THEN 1 END) AS n_with_email,
        | COUNT(CASE WHEN regexp_matches(text,
        |   'https?://[A-Za-z0-9./_-]+') THEN 1 END) AS n_with_url,
        | COUNT(CASE WHEN regexp_matches(text,
        |   '[A-Za-z]{8,}') THEN 1 END) AS n_with_longword
        |FROM documents GROUP BY source""".stripMargin,
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
    "q87_bpe_tokens" -> {
      val nTok = s"CASE WHEN length(trim(text)) = 0 THEN 0 " +
        s"ELSE len(regexp_split_to_array(trim(text), '\\s+')) END"
      s"""WITH t AS (SELECT lang, ${toksSql("text")} AS w,
         |  CAST($nTok AS BIGINT) AS n_ws FROM documents),
         |f AS (SELECT lang, n_ws,
         |  COALESCE(list_sum(list_transform(w, x -> ${TextFunctions.bpeWordTokensSql("x")})), 0) AS n_bpe
         | FROM t)
         |SELECT lang, COUNT(*) AS n_docs,
         | CAST(SUM(n_bpe) AS BIGINT) AS total_subword_tokens,
         | CAST(SUM(n_ws) AS BIGINT) AS total_ws_tokens
         |FROM f GROUP BY lang""".stripMargin
    },
    "q90_unigram_surprisal" ->
      s"""WITH tok AS (SELECT doc_id, unnest(${toksSql("text")}) AS t FROM documents),
         |vocab AS (SELECT t, COUNT(*) AS c FROM tok GROUP BY t),
         |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n_total, COUNT(*) AS n_vocab FROM vocab),
         |qv AS (SELECT t, CAST(LEAST((n_total + n_vocab) // (c + 1), 2147483647) AS BIGINT) AS q
         |       FROM vocab CROSS JOIN tot),
         |bits AS (SELECT t, CAST(length(bin(q * q)) - 1 AS BIGINT) AS hb FROM qv),
         |pd AS (SELECT doc_id, CAST(SUM(hb) AS BIGINT) AS sum_hb, COUNT(*) AS n_tok
         |       FROM tok JOIN bits USING (t) GROUP BY doc_id),
         |f AS (SELECT d.lang,
         |  CASE WHEN pd.doc_id IS NULL THEN 0.0
         |       ELSE FLOOR(CAST(sum_hb AS DOUBLE) / (n_tok * 2) * 1e6) / 1e6 END AS surprisal
         | FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id)
         |SELECT lang, COUNT(*) AS n_docs,
         | ${davgSql("surprisal")} AS avg_surprisal,
         | COUNT(CASE WHEN surprisal > 4.6 THEN 1 END) AS n_flagged
         |FROM f GROUP BY lang""".stripMargin,
    "q96_bigram_surprisal" ->
      s"""WITH t AS (SELECT doc_id, lang, ${toksSql("text")} AS w FROM documents),
         |bi AS (SELECT doc_id, unnest([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS b
         |       FROM t),
         |cb AS (SELECT b, COUNT(*) AS c_ut FROM bi GROUP BY b),
         |vocab AS (SELECT COUNT(DISTINCT tok) AS v
         |          FROM (SELECT unnest(w) AS tok FROM t)),
         |cu AS (SELECT split_part(b, ' ', 1) AS u, CAST(SUM(c_ut) AS BIGINT) AS c_u
         |       FROM cb GROUP BY u),
         |qv AS (SELECT b, CAST(LEAST((c_u + v) // (c_ut + 1), 2147483647) AS BIGINT) AS q
         |       FROM cb JOIN cu ON split_part(cb.b, ' ', 1) = cu.u CROSS JOIN vocab),
         |bits AS (SELECT b, CAST(length(bin(q * q)) - 1 AS BIGINT) AS hb FROM qv),
         |pd AS (SELECT doc_id, CAST(SUM(hb) AS BIGINT) AS sum_hb, COUNT(*) AS n_bi
         |       FROM bi JOIN bits USING (b) GROUP BY doc_id),
         |f AS (SELECT d.lang,
         |  CASE WHEN pd.doc_id IS NULL THEN 0.0
         |       ELSE FLOOR(CAST(sum_hb AS DOUBLE) / (n_bi * 2) * 1e6) / 1e6 END AS surprisal
         | FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id)
         |SELECT lang, COUNT(*) AS n_docs,
         | ${davgSql("surprisal")} AS avg_surprisal,
         | COUNT(CASE WHEN surprisal > 4.75 THEN 1 END) AS n_flagged
         |FROM f GROUP BY lang""".stripMargin,
    "q91_bm25" -> {
      val values = Bm25Queries
        .map { case (q, t) => s"(CAST($q AS BIGINT), '$t')" }.mkString(", ")
      val inList = Bm25Queries.map(t => s"'${t._2}'").distinct.mkString(", ")
      val nTok = s"CASE WHEN length(trim(text)) = 0 THEN 0 " +
        s"ELSE len(regexp_split_to_array(trim(text), '\\s+')) END"
      s"""WITH qt(query_id, t) AS (SELECT * FROM (VALUES $values)),
         |tok AS (SELECT doc_id, unnest(${toksSql("text")}) AS t FROM documents),
         |tf AS (SELECT doc_id, t, COUNT(*) AS tf FROM tok GROUP BY doc_id, t),
         |dfreq AS (SELECT t, COUNT(*) AS df FROM tf WHERE t IN ($inList) GROUP BY t),
         |dl AS (SELECT doc_id, CAST($nTok AS DOUBLE) AS dl FROM documents),
         |stats AS (SELECT COUNT(*) AS n_docs, CAST(SUM($nTok) AS BIGINT) AS total_tok
         |          FROM documents),
         |scored AS (SELECT query_id, tf.doc_id AS doc_id,
         |  (CAST(n_docs AS DOUBLE) + 1.0) / (CAST(df AS DOUBLE) + 0.5) *
         |    (CAST(tf AS DOUBLE) * 2.2) /
         |    (CAST(tf AS DOUBLE) + 1.2 *
         |      (0.25 + 0.75 * (dl / (CAST(total_tok AS DOUBLE) / n_docs)))) AS ts
         | FROM tf JOIN qt ON tf.t = qt.t JOIN dfreq ON tf.t = dfreq.t
         |      JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats),
         |s AS (SELECT query_id, doc_id, ${fsumSql("ts")} AS score
         |      FROM scored GROUP BY query_id, doc_id)
         |SELECT query_id, doc_id, score, rank FROM (
         | SELECT query_id, doc_id, score,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY score DESC, doc_id) AS INT) AS rank
         | FROM s) r
         |WHERE rank <= 10""".stripMargin
    },
    // hybrid retrieval replay: q23's brute shortlist CTE composed with
    // q91's BM25 CTEs over the documents ⋈ embeddings corpus — fusion
    // is a left join + one rank window, so the oracle is literally the
    // two gated legs' SQL stitched at the shortlist
    "q107_hybrid_retrieval" -> {
      val values = Bm25Queries
        .map { case (q, t) => s"(CAST($q AS BIGINT), '$t')" }.mkString(", ")
      val inList = Bm25Queries.map(t => s"'${t._2}'").distinct.mkString(", ")
      val nTok = s"CASE WHEN length(trim(text)) = 0 THEN 0 " +
        s"ELSE len(regexp_split_to_array(trim(text), '\\s+')) END"
      s"""WITH qt(query_id, t) AS (SELECT * FROM (VALUES $values)),
         |corpus AS (SELECT d.doc_id, d.text, e.embedding
         |           FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id),
         |qv AS (SELECT vec_id AS query_id, embedding AS qe
         |       FROM embeddings WHERE vec_id IN (1, 2, 3)),
         |ann AS (SELECT query_id, doc_id, cos FROM (
         |  SELECT q.query_id, c.doc_id,
         |   list_cosine_similarity(q.qe, c.embedding) AS cos,
         |   ROW_NUMBER() OVER (PARTITION BY q.query_id
         |     ORDER BY list_cosine_similarity(q.qe, c.embedding) DESC, c.doc_id) AS arank
         |  FROM qv q CROSS JOIN corpus c WHERE c.doc_id <> q.query_id) t
         | WHERE arank <= 50),
         |tok AS (SELECT doc_id, unnest(${toksSql("text")}) AS t FROM corpus),
         |tf AS (SELECT doc_id, t, COUNT(*) AS tf FROM tok GROUP BY doc_id, t),
         |dfreq AS (SELECT t, COUNT(*) AS df FROM tf WHERE t IN ($inList) GROUP BY t),
         |dl AS (SELECT doc_id, CAST($nTok AS DOUBLE) AS dl FROM corpus),
         |stats AS (SELECT COUNT(*) AS n_docs, CAST(SUM($nTok) AS BIGINT) AS total_tok
         |          FROM corpus),
         |scored AS (SELECT query_id, tf.doc_id AS doc_id,
         |  (CAST(n_docs AS DOUBLE) + 1.0) / (CAST(df AS DOUBLE) + 0.5) *
         |    (CAST(tf AS DOUBLE) * 2.2) /
         |    (CAST(tf AS DOUBLE) + 1.2 *
         |      (0.25 + 0.75 * (dl / (CAST(total_tok AS DOUBLE) / n_docs)))) AS ts
         | FROM tf JOIN qt ON tf.t = qt.t JOIN dfreq ON tf.t = dfreq.t
         |      JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats),
         |s AS (SELECT query_id, doc_id, ${fsumSql("ts")} AS score
         |      FROM scored GROUP BY query_id, doc_id),
         |j AS (SELECT a.query_id, a.doc_id,
         |        COALESCE(s.score, 0.0) AS score, a.cos
         |      FROM ann a LEFT JOIN s ON a.query_id = s.query_id AND a.doc_id = s.doc_id)
         |SELECT query_id, doc_id, rank, score FROM (
         | SELECT query_id, doc_id, score,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY score DESC, cos DESC, doc_id) AS INT) AS rank
         | FROM j) r
         |WHERE rank <= 10""".stripMargin
    },
    // extraction replay: identical pipeline order (script/style blocks
    // dotall-non-greedy → comments → tags → numeric refs ([32,126]
    // minus 38, the same split-transform decode) → entities with &amp;
    // and the ampersand's numeric forms last → whitespace collapse →
    // trim) over the same synthesized HTML; md5 of the extracted text
    // is the contract
    "q111_html_extract" -> {
      // numeric character reference decode over a tag-free string: one
      // piece per '&#' occurrence; the piece decodes iff it starts with
      // a valid terminated reference whose code point is printable
      // ASCII and not '&' (38). Spark parses hex via conv(h,16,10),
      // DuckDB via CAST('0x'||h) — identical on the regex-validated set.
      val decNum = "CAST(regexp_extract(pc, '^([0-9]{1,7});', 1) AS INTEGER)"
      val decStr = "regexp_extract(pc, '^([0-9]{1,7});', 1)"
      val hexNum = "CAST('0x' || regexp_extract(pc, '^[xX]([0-9a-fA-F]{1,6});', 1) AS INTEGER)"
      val hexStr = "regexp_extract(pc, '^[xX]([0-9a-fA-F]{1,6});', 1)"
      val numDecode = (inner: String) =>
        s"""array_to_string(list_transform(string_split($inner, '&#'), (pc, i) ->
           |  CASE WHEN i = 1 THEN pc
           |   WHEN regexp_matches(pc, '^[0-9]{1,7};')
           |        AND $decNum BETWEEN 32 AND 126 AND $decNum <> 38
           |     THEN chr($decNum) || substr(pc, length($decStr) + 2)
           |   WHEN regexp_matches(pc, '^[xX][0-9a-fA-F]{1,6};')
           |        AND $hexNum BETWEEN 32 AND 126 AND $hexNum <> 38
           |     THEN chr($hexNum) || substr(pc, length($hexStr) + 3)
           |   ELSE '&#' || pc END), '')""".stripMargin
      s"""WITH h AS (SELECT doc_id,
         |  '<html><head><title>Doc ' || doc_id || '</title>' ||
         |  '<style>p { color: red; }</style>' ||
         |  '<script>var x = 1 < 2;</script></head>' ||
         |  '<!-- hidden a > b comment --><body><h1>Doc ' || doc_id || '</h1><p>' || text ||
         |  '</p><p>5 &lt; 6 &amp;&amp; 7 &gt; 3 &quot;q&quot; &apos;a&apos;&nbsp;end</p>' ||
         |  '<p>&#65;&#x42;&#x7a; n &#38;lt; a &#8217; u &#x1F600; e &amp;#65; d 100%zz</p></body></html>'
         |    AS html
         | FROM documents),
         |t AS (SELECT doc_id,
         |  regexp_replace(
         |    regexp_replace(
         |      regexp_replace(
         |        regexp_replace(html, '(?s)<script.*?</script>', ' ', 'g'),
         |        '(?s)<style.*?</style>', ' ', 'g'),
         |      '(?s)<!--.*?-->', ' ', 'g'),
         |    '<[^>]*>', ' ', 'g') AS notags
         | FROM h),
         |x AS (SELECT doc_id, trim(regexp_replace(
         |  replace(replace(replace(replace(replace(replace(replace(replace(replace(
         |    ${numDecode("notags")},
         |    '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
         |    '&apos;', ''''), '&nbsp;', ' '), '&amp;', '&'),
         |    '&#38;', '&'), '&#x26;', '&'), '&#X26;', '&'),
         |  '\\s+', ' ', 'g')) AS extracted
         | FROM t)
         |SELECT doc_id, md5(extracted) AS text_md5,
         | CAST(length(extracted) AS BIGINT) AS n_chars
         |FROM x""".stripMargin
    },
    // canonicalization replay: same op order (drop fragment →
    // percent-normalize (hex-case fold + unreserved decode, the replace
    // chain generated from the SAME table the engine folds over) →
    // split scheme → split QUERY before host/path ('?' may precede any
    // '/') → lower host, strip ^www., trailing root dots, default :80 —
    // non-default ports survive → drop utm_*/empty params → sort →
    // rejoin); paths stay case-sensitive on purpose
    "q109_url_dedup" ->
      s"""WITH $urlCanonOracleCtes
         |SELECT canonical_url, COUNT(*) AS n_aliases,
         | MIN(doc_id) AS first_doc_id
         |FROM p7 GROUP BY canonical_url""".stripMargin,
    // host-level rollup over the SAME canonical chain; the ppm is pure
    // integer-over-double floor (exact below 2^53), spam gate replayed
    // as a wrapped projection
    "q134_host_stats" ->
      s"""WITH $urlCanonOracleCtes,
         |h AS (SELECT p7.doc_id, canonical_url,
         |   regexp_extract(canonical_url, '^[a-z]+://([^/]+)', 1) AS host,
         |   d.lang, d.n_chars
         |  FROM p7 JOIN documents d ON d.doc_id = p7.doc_id),
         |a AS (SELECT host, COUNT(*) AS n_docs,
         |   COUNT(DISTINCT canonical_url) AS n_unique_urls,
         |   COUNT(DISTINCT lang) AS n_langs,
         |   CAST(SUM(n_chars) AS BIGINT) AS total_chars,
         |   CAST(FLOOR((COUNT(*) - COUNT(DISTINCT canonical_url)) * 1000000
         |     / CAST(COUNT(*) AS DOUBLE)) AS BIGINT) AS dup_ppm
         |  FROM h GROUP BY host)
         |SELECT host, n_docs, n_unique_urls, n_langs, total_chars, dup_ppm,
         | dup_ppm > 500000 AS is_spammy FROM a""".stripMargin,
    "q78_quantifiers" ->
      s"""WITH t AS (SELECT lang, ${toksSql("text")} AS w FROM documents)
         |SELECT lang, COUNT(*) AS n_docs,
         | COUNT(CASE WHEN len(list_filter(w, x -> length(x) > 15)) > 0 THEN 1 END)
         |   AS n_any_long,
         | COUNT(CASE WHEN len(list_filter(w, x -> length(x) >= 12)) = 0 THEN 1 END)
         |   AS n_all_short
         |FROM t GROUP BY lang""".stripMargin,
    "q115_skyline" -> {
      val stops = TextFunctions.Stopwords.map(s => s"'$s'").mkString(",")
      s"""WITH t AS (SELECT lang, doc_id, n_chars, text, ${toksSql("text")} AS w FROM documents),
         |f AS (
         | SELECT lang, doc_id, n_chars,
         |  ROUND((
         |   LEAST(CAST(length(text) AS DOUBLE) / 500.0, 1.0) +
         |   GREATEST(0.0, 1.0 - (CASE WHEN length(text) = 0 THEN 0.0
         |     ELSE CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE)
         |          / length(text) END) * 5.0) +
         |   LEAST((CASE WHEN len(w) = 0 THEN 0.0
         |     ELSE CAST(len(list_filter(w, t -> t IN ($stops))) AS DOUBLE)
         |          / len(w) END) * 4.0, 1.0)
         |  ) / 3.0, 6) AS quality
         | FROM t),
         |w2 AS (SELECT lang, doc_id, n_chars, quality,
         |  MAX(quality) OVER (PARTITION BY lang ORDER BY n_chars
         |    RANGE BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS mq_longer,
         |  MAX(quality) OVER (PARTITION BY lang ORDER BY n_chars
         |    RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS mq_geq
         | FROM f)
         |SELECT lang, doc_id, n_chars, quality FROM w2
         |WHERE (mq_longer IS NULL OR mq_longer < quality) AND NOT (mq_geq > quality)""".stripMargin
    },
    "q116_spell_pairs" ->
      s"""WITH tok AS (SELECT unnest(${toksSql("text")}) AS w FROM documents),
         |vocab AS (SELECT w, COUNT(*) AS c FROM tok
         |          WHERE length(w) >= 3 AND regexp_matches(w, '^[a-z]+$$')
         |          GROUP BY w HAVING COUNT(*) >= 3),
         |v AS (SELECT w, c, unnest(list_prepend(w, list_concat(
         |   [substr(w,1,i-1)||substr(w,i+1) for i in range(1,length(w)+1)],
         |   flatten([[substr(w,1,i-1)||substr(w,i+1,j-i-1)||substr(w,j+1)
         |             for j in range(i+1,length(w)+1)] for i in range(1,length(w))])
         |  ))) AS var FROM vocab),
         |p AS (SELECT DISTINCT a.w AS w1, b.w AS w2, a.c AS c1, b.c AS c2
         |      FROM v a JOIN v b ON a.var = b.var AND a.w < b.w)
         |SELECT w1, w2, c1, c2, CAST(levenshtein(w1, w2) AS BIGINT) AS dist
         |FROM p WHERE levenshtein(w1, w2) <= 2""".stripMargin,
    "q117_trigram_lm" ->
      s"""WITH d AS (SELECT doc_id, lang,
         |   (${fnvSql("text")} & 2147483647) % 100 AS bucket,
         |   ${toksSql("text")} AS w
         |  FROM documents),
         |tr AS (SELECT w FROM d WHERE bucket < 80),
         |te AS (SELECT doc_id, lang, w FROM d WHERE bucket >= 90),
         |tri_tr AS (SELECT g, COUNT(*) AS c_uvw FROM
         |  (SELECT unnest([w[i]||' '||w[i+1]||' '||w[i+2] for i in range(1, len(w)-1)]) AS g FROM tr)
         |  GROUP BY g),
         |bi_tr AS (SELECT b, COUNT(*) AS c_b FROM
         |  (SELECT unnest([w[i]||' '||w[i+1] for i in range(1, len(w))]) AS b FROM tr)
         |  GROUP BY b),
         |uni_tr AS (SELECT u, COUNT(*) AS c_u FROM (SELECT unnest(w) AS u FROM tr) GROUP BY u),
         |model AS (SELECT CAST(SUM(c_u) AS BIGINT) AS n_total, COUNT(*) AS v FROM uni_tr),
         |tri AS (SELECT doc_id, g,
         |   split_part(g, ' ', 1) || ' ' || split_part(g, ' ', 2) AS prefix,
         |   split_part(g, ' ', 2) || ' ' || split_part(g, ' ', 3) AS suffix,
         |   split_part(g, ' ', 2) AS w2, split_part(g, ' ', 3) AS w3
         |  FROM (SELECT doc_id,
         |        unnest([w[i]||' '||w[i+1]||' '||w[i+2] for i in range(1, len(w)-1)]) AS g FROM te)),
         |j AS (SELECT tri.doc_id,
         |   CASE WHEN t3.c_uvw IS NOT NULL THEN 3
         |        WHEN bs.c_b IS NOT NULL THEN 2 ELSE 1 END AS level,
         |   CASE WHEN t3.c_uvw IS NOT NULL THEN LEAST((bp.c_b + m.v) // (t3.c_uvw + 1), 2147483647)
         |        WHEN bs.c_b IS NOT NULL THEN LEAST((u2.c_u + m.v) // (bs.c_b + 1), 2147483647)
         |        ELSE LEAST((m.n_total + m.v) // (COALESCE(u3.c_u, 0) + 1), 2147483647) END AS q
         |  FROM tri
         |  LEFT JOIN tri_tr t3 ON tri.g = t3.g
         |  LEFT JOIN bi_tr bp ON tri.prefix = bp.b
         |  LEFT JOIN bi_tr bs ON tri.suffix = bs.b
         |  LEFT JOIN uni_tr u2 ON tri.w2 = u2.u
         |  LEFT JOIN uni_tr u3 ON tri.w3 = u3.u
         |  CROSS JOIN model m),
         |h AS (SELECT doc_id, level,
         |   CAST(length(bin(q * q)) - 1 AS BIGINT)
         |     + CASE level WHEN 2 THEN 4 WHEN 1 THEN 8 ELSE 0 END AS hb
         |  FROM j),
         |pd AS (SELECT doc_id, CAST(SUM(hb) AS BIGINT) AS sum_hb, COUNT(*) AS n_tri,
         |   COUNT(CASE WHEN level = 3 THEN 1 END) AS tri_hits,
         |   COUNT(CASE WHEN level = 2 THEN 1 END) AS bi_hits,
         |   COUNT(CASE WHEN level = 1 THEN 1 END) AS uni_hits
         |  FROM h GROUP BY doc_id),
         |f AS (SELECT te.lang,
         |   CASE WHEN pd.doc_id IS NULL THEN 0.0
         |        ELSE FLOOR(CAST(sum_hb AS DOUBLE) / (n_tri * 2) * 1e6) / 1e6 END AS surprisal,
         |   COALESCE(tri_hits, 0) AS tri_hits, COALESCE(bi_hits, 0) AS bi_hits,
         |   COALESCE(uni_hits, 0) AS uni_hits
         |  FROM te LEFT JOIN pd ON te.doc_id = pd.doc_id)
         |SELECT lang, COUNT(*) AS n_docs,
         | ${davgSql("surprisal")} AS avg_surprisal,
         | COUNT(CASE WHEN surprisal > 5.0 THEN 1 END) AS n_flagged,
         | CAST(SUM(tri_hits) AS BIGINT) AS n_tri_hits,
         | CAST(SUM(bi_hits) AS BIGINT) AS n_bi_hits,
         | CAST(SUM(uni_hits) AS BIGINT) AS n_uni_hits
         |FROM f GROUP BY lang""".stripMargin,
    "q119_inverted_index" ->
      s"""WITH tok AS (SELECT doc_id, unnest(${toksSql("text")}) AS term FROM documents),
         |tf AS (SELECT term, doc_id, COUNT(*) AS tf FROM tok GROUP BY term, doc_id)
         |SELECT term, COUNT(*) AS df, CAST(SUM(tf) AS BIGINT) AS cf,
         | array_to_string(list_transform(list_sort(list(doc_id))[1:8],
         |   x -> CAST(x AS VARCHAR)), ',') AS head_postings
         |FROM tf GROUP BY term HAVING COUNT(*) >= 5""".stripMargin,
  )
}
