package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-size overlapping document chunking — the explode that turns a
  * document corpus into training-sequence windows (context-length
  * slicing with overlap so no boundary-spanning text is lost).
  *
  * Scale shape: pure map-side — chunk count is computed per row, the
  * explode amplifies rows within the same partition, and no shuffle,
  * join, or state is involved, so the operator scales with input bytes
  * alone (the property that matters when chunking 100 TB into windows:
  * it pipelines inside whole-stage codegen between the parquet scan and
  * whatever aggregation follows). Row growth is bounded by
  * ceil(len/step) per document — output partitions inflate by roughly
  * chunkChars/(chunkChars − overlapChars), worth sizing
  * `maxPartitionBytes` down by that factor when the downstream op is
  * memory-bound.
  *
  * Chunk i covers char offsets [i·step, i·step + chunkChars) with
  * step = chunkChars − overlapChars; n = ceil(max(len − overlap, 1) /
  * step) chunks cover every char, consecutive chunks share exactly
  * `overlapChars` chars, and a document shorter than one chunk yields a
  * single chunk. Reconstruction invariant (spec'd):
  * chunks.head + chunks.tail.map(_.drop(overlapChars)) == text.
  */
object Chunking {

  /** Adds `chunk_index` / `chunk_start` (0-based char offset) /
    * `chunk_text` rows per input row; other columns ride along. Those
    * three output names must not pre-exist on the input (rejected with
    * a clear error rather than silently overwritten); the `__`-prefixed
    * internal temps are in the same reject list, so a colliding input
    * gets the clear rename-first error, not an ambiguous-alias failure.
    */
  def chunk(
      docs: DataFrame,
      textCol: String,
      chunkChars: Int,
      overlapChars: Int): DataFrame = {
    require(overlapChars >= 0 && chunkChars > overlapChars,
      s"need chunkChars > overlapChars >= 0, got $chunkChars/$overlapChars")
    val reserved = Seq("chunk_index", "chunk_start", "chunk_text", "__i", "__n_chunks")
    val clash = docs.columns.toSet.intersect(reserved.toSet)
    require(clash.isEmpty,
      s"input already has ${clash.mkString(", ")}; rename before chunking")
    val step = chunkChars - overlapChars
    docs
      .withColumn("__n_chunks",
        ceil(greatest(length(col(textCol)) - overlapChars, lit(1))
          .cast("double") / step).cast("long"))
      .select(col("*"),
        posexplode(sequence(lit(0L), col("__n_chunks") - 1)).as(Seq("chunk_index", "__i")))
      .withColumn("chunk_start", col("__i") * step)
      .withColumn("chunk_text",
        col(textCol).substr(col("chunk_start").cast("int") + 1, lit(chunkChars)))
      .drop("__i", "__n_chunks")
  }

  /** Content-defined chunking (CDC), token-level: a chunk boundary falls
    * AFTER token p whenever fnv64(token_p) & (meanTokens−1) == 0 — the
    * gear/rolling-cut rule storage dedup systems use, giving chunks of
    * geometric mean length `meanTokens`. Unlike [[chunk]]'s fixed
    * windows, cut points depend only on LOCAL content: inserting or
    * deleting a token early in a document shifts that chunk's boundary
    * but leaves every later cut in place, so shared suffixes/passages
    * still hash to identical chunks — the property that makes
    * chunk-level dedup find common content across edited copies where
    * fixed-width chunking realigns everything downstream of one edit.
    *
    * Emits one row per chunk: input columns + (chunk_idx, chunk_hash =
    * fnv64 of the space-joined chunk tokens, n_tok). Chunks partition
    * the token sequence exactly; empty documents emit no rows.
    *
    * Scale shape: pure map-side, like [[chunk]] — cuts, bounds, and
    * chunk hashes are array expressions inside one projection, the
    * explode amplifies rows in place, and nothing shuffles until the
    * caller aggregates (and then only fixed-width (id, hash, n) rows).
    */
  def contentDefinedChunks(
      docs: DataFrame,
      textCol: String,
      meanTokens: Int = 8): DataFrame = {
    require(meanTokens > 0 && (meanTokens & (meanTokens - 1)) == 0,
      s"meanTokens must be a power of two, got $meanTokens")
    val reserved = Seq("chunk_idx", "chunk_hash", "n_tok", "__c")
    val clash = docs.columns.toSet.intersect(reserved.toSet)
    require(clash.isEmpty,
      s"input already has ${clash.mkString(", ")}; rename before chunking")
    import graft.functions.TextFunctions.bind
    import org.apache.spark.sql.graft.TextHashExpressions.fnv64
    val mask = lit((meanTokens - 1).toLong)
    val chunks = bind(graft.functions.TextFunctions.tokens(col(textCol))) { toks =>
      when(size(toks) === 0,
        array().cast("array<struct<chunk_hash:bigint,n_tok:int>>"))
        .otherwise(bind(filter(sequence(lit(1), size(toks)),
          p => fnv64(element_at(toks, p)).bitwiseAND(mask) === lit(0L))) { cuts =>
          // chunk i spans [starts(i), ends(i)]; the trailing pair is
          // dropped when the last token is itself a cut (s > e)
          val starts = concat(array(lit(1)), transform(cuts, c => c + lit(1)))
          val ends = concat(cuts, array(size(toks)))
          val bounds = filter(
            transform(sequence(lit(1), size(cuts) + lit(1)), i =>
              struct(element_at(starts, i).as("s"), element_at(ends, i).as("e"))),
            b => b.getField("s") <= b.getField("e"))
          transform(bounds, b => struct(
            fnv64(concat_ws(" ",
              slice(toks, b.getField("s"),
                b.getField("e") - b.getField("s") + lit(1)))).as("chunk_hash"),
            (b.getField("e") - b.getField("s") + lit(1)).as("n_tok")))
        })
    }
    docs.select(col("*"), posexplode(chunks).as(Seq("chunk_idx", "__c")))
      .withColumn("chunk_hash", col("__c.chunk_hash"))
      .withColumn("n_tok", col("__c.n_tok"))
      .drop("__c")
  }
}
