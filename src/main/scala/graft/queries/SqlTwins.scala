package graft.queries

/** DuckDB twins of the native Catalyst expressions and shared literals,
  * used by the per-family oracle maps. Splitting these from the queries
  * keeps every oracle a pure string builder over public arithmetic.
  */
private[queries] object SqlTwins {
  // ---------------------------------------------------------------- helpers
  val ShipCutoff = "1998-09-02"

  // ---- DuckDB twins of the native text-hash expressions --------------
  // (org.apache.spark.sql.graft.TextHashOps — FNV-1a over codepoints with
  // hugeint modular arithmetic, so signature queries get full hash
  // oracles instead of rows-only checks.)

  /** Whitespace tokens with the empty-string guard (mirrors
    * TextFunctions.tokens: "" → [], not ['']). */
  def toksSql(x: String): String =
    s"""CASE WHEN length(trim($x)) = 0 THEN CAST([] AS VARCHAR[])
       | ELSE regexp_split_to_array(trim($x), '\\s+') END""".stripMargin.replace("\n", " ")

  /** FNV-1a 64-bit over codepoints of `t`, as UBIGINT. */
  def fnvSql(t: String): String =
    s"""CAST(list_reduce(list_prepend(CAST(14695981039346656037 AS HUGEINT),
       |  list_transform(range(1, length($t)+1), i -> CAST(unicode(substr($t, i, 1)) AS HUGEINT))),
       |  (acc, c) -> (CAST(xor(CAST(acc AS UBIGINT), CAST(c AS UBIGINT)) AS HUGEINT)
       |               * 1099511628211) % 18446744073709551616) AS UBIGINT)""".stripMargin
      .replace("\n", " ")

  /** z·m mod 2⁶⁴ for a HUGEINT-valued expression z in [0, 2⁶⁴) and a
    * 64-bit constant m — split multiply so the intermediate never
    * exceeds HUGEINT range (z·m directly can reach 2¹²⁸). */
  private def mulMod64(z: String, m: BigInt): String = {
    val mLo = m & 0xFFFFFFFFL
    val mHi = m >> 32
    s"""(($z * $mLo + (($z % 4294967296) * $mHi % 4294967296) * 4294967296)
       | % 18446744073709551616)""".stripMargin.replace("\n", " ")
  }

  /** splitmix64 finalizer of a UBIGINT expression (mirrors
    * TextHashOps.mix64) — the avalanche pass order-statistic consumers
    * (KMV) apply on top of fnv64. Keep the argument a simple column
    * reference: the template repeats it many times. */
  def mixSql(x: String): String = {
    val c1 = BigInt("11400714819323198485") // 0x9E3779B97F4A7C15
    val c2 = BigInt("13787848793156543929") // 0xBF58476D1CE4E5B9
    val c3 = BigInt("10723151780598845931") // 0x94D049BB133111EB
    val z1 = s"((CAST($x AS HUGEINT) + $c1) % 18446744073709551616)"
    val x1 = s"CAST(xor(CAST($z1 AS UBIGINT), CAST($z1 AS UBIGINT) >> 30) AS HUGEINT)"
    val z2 = mulMod64(x1, c2)
    val x2 = s"CAST(xor(CAST($z2 AS UBIGINT), CAST($z2 AS UBIGINT) >> 27) AS HUGEINT)"
    val z3 = mulMod64(x2, c3)
    s"CAST(xor(CAST($z3 AS UBIGINT), CAST($z3 AS UBIGINT) >> 31) AS UBIGINT)"
  }

  /** Rolling rotate-xor combine of a UBIGINT hash list (mirrors
    * TextFunctions.fingerprint: acc' = rotl5(acc) xor h, init 0). */
  def rollSql(hashes: String): String =
    s"""CAST(list_reduce(list_prepend(CAST(0 AS UBIGINT), $hashes),
       |  (acc, h) -> xor(CAST(((CAST(acc AS HUGEINT) * 32) % 18446744073709551616) AS UBIGINT)
       |                  | (acc >> 59), h)) AS UBIGINT)""".stripMargin.replace("\n", " ")

  /** UBIGINT → two's-complement BIGINT (Spark longs are signed). */
  def signedSql(x: String): String =
    s"""CAST(CAST($x AS HUGEINT) -
       | CASE WHEN $x >= 9223372036854775808 THEN CAST(18446744073709551616 AS HUGEINT)
       |      ELSE 0 END AS BIGINT)""".stripMargin.replace("\n", " ")

  /** Per-doc SimHash vote CTEs over `documents` (shared by q21/q32):
    * yields relation `sv(doc_id, c0..c63)` of per-bit vote sums; docs
    * with zero tokens are absent (callers COALESCE the signature to 0,
    * matching simhash64([]) = 0).
    */
  val simhashVotesSql: String = {
    val votes = (0 until 64).map(b =>
      s"SUM(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS c$b").mkString(", ")
    s"""th AS (SELECT doc_id, list_transform(${toksSql("text")}, t -> ${fnvSql("t")}) AS hs
       |  FROM documents),
       |u AS (SELECT doc_id, unnest(hs) AS h FROM th),
       |sv AS (SELECT doc_id, $votes FROM u GROUP BY doc_id)""".stripMargin
  }

  /** Packs sv's 64 vote sums into an UBIGINT signature. */
  val simhashUnsignedPackSql: String =
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
  def planeWeightsSql(plane: Int): String =
    "[" + (0 until 64).map(d =>
      org.apache.spark.sql.graft.VectorHashOps.weight(d, plane)).mkString(",") + "]"

  /** Packed bucket id of table `table` (MSB-first over its planes) for a
    * DOUBLE[] column `emb` — mirrors VectorHashOps.buckets. */
  def bucketSql(emb: String, table: Int, nPlanes: Int): String =
    (0 until nPlanes).map { i =>
      val bit = 1L << (nPlanes - 1 - i)
      s"(CASE WHEN list_dot_product($emb, ${planeWeightsSql(table * nPlanes + i)}) >= 0 THEN $bit ELSE 0 END)"
    }.mkString(" + ")

  /** Multi-probe collision predicate between bucket columns `a`/`b`:
    * single-bit probes ⇒ candidate iff hamming ≤ 1 in SOME table. */
  def anyTableCollidesSql(a: String, b: String, nTables: Int): String =
    (0 until nTables).map(t =>
      s"bit_count(xor($a$t, $b$t)) <= 1").mkString("(", " OR ", ")")

  /** The first `nPlanes` hyperplane weight rows as ONE DuckDB
    * list-of-lists literal — for oracles whose plane count is derived
    * inside the SQL itself (a dynamic `wm[t*np+i+1]` lookup replaces the
    * per-plane literals [[bucketSql]] embeds for a fixed dial). */
  def weightMatrixSql(nPlanes: Int): String =
    (0 until nPlanes).map(planeWeightsSql).mkString("[", ",", "]")

  /** The hashed-classifier weight vector as a DuckDB double-list literal
    * (mirrors TextFunctions.ClassifierWeights — exact 1e-3 multiples, so
    * Double.toString round-trips bit-for-bit through DuckDB's parser). */
  val classifierWeightsSql: String =
    graft.functions.TextFunctions.ClassifierWeights.mkString("[", ",", "]")

  /** Packed bucket of table `t` with the plane count taken from an
    * in-scope SQL column `np` (MSB-first, mirroring VectorHashOps.buckets
    * — plane i of table t is global plane t·np+i). `wm` must bind a
    * [[weightMatrixSql]] literal covering nTables·np planes. */
  def dynamicBucketSql(t: Int): String =
    s"""CAST(list_sum(list_transform(range(0, np), i ->
       | CASE WHEN list_dot_product(emb, wm[$t*np+i+1]) >= 0
       |  THEN CAST(power(2, np-1-i) AS BIGINT) ELSE 0 END)) AS BIGINT)""".stripMargin
      .replace("\n", " ")

}
