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
    * a clear error rather than silently overwritten); internal temps
    * are `__`-prefixed so generic inputs can't collide with them.
    */
  def chunk(
      docs: DataFrame,
      textCol: String,
      chunkChars: Int,
      overlapChars: Int): DataFrame = {
    require(overlapChars >= 0 && chunkChars > overlapChars,
      s"need chunkChars > overlapChars >= 0, got $chunkChars/$overlapChars")
    val reserved = Seq("chunk_index", "chunk_start", "chunk_text")
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
}
