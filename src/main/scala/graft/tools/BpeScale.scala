package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** BPE-learning scale measurement: wall for k merge iterations vs the
  * corpus-sublinear inputs that bound it (corpus tokens vs distinct
  * words) — the reduction the word-frequency-dict formulation buys.
  *
  * Usage: runMain graft.tools.BpeScale <sfDir> [numMerges=6]
  */
object BpeScale {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val merges = args.lift(1).map(_.toInt).getOrElse(6)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.documents(spark, dir)
    val toks = docs.select(explode(
      graft.functions.TextFunctions.tokens(col("text"))).as("w"))
    val (nTok, nVocab) = {
      val r = toks.agg(count(lit(1)), countDistinct(col("w"))).first()
      (r.getLong(0), r.getLong(1))
    }
    val t0 = System.nanoTime()
    val m = graft.operators.Bpe.learnMerges(docs, "text", merges).collect()
    val sec = (System.nanoTime() - t0) / 1e9
    val top = m.map(r => s""""${r.getString(3)}":${r.getLong(4)}""").mkString(",")
    println(s"""{"corpus_tokens":$nTok,"distinct_words":$nVocab,"merges":$merges,"sec":${math.round(sec * 1000) / 1000.0},"learned":{$top}}""")
    spark.stop()
  }
}
