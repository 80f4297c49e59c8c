package graft.tools

import graft.queries.QueryPack
import org.apache.spark.sql.SparkSession

/** Wall-clock comparison of unsharded vs sharded sequence packing
  * (`QueryPack.sequencePack` / `sequencePackSharded`): the per-stratum
  * cumulative window's parallelism is bounded by the language count
  * (5 on the test corpora) until sharding fans it out to
  * languages × nShards partitions. Reports both walls + the bin
  * overhead sharding pays (≤ nShards−1 partial bins per language).
  *
  * Usage: runMain graft.tools.PackShard <sfDir> [nShards]
  */
object PackShard {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val shards = args.lift(1).map(_.toInt).getOrElse(16)
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
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def binSum(rows: Array[org.apache.spark.sql.Row]): Long =
      rows.map(_.getAs[Long]("n_bins")).sum
    // warm the scan cache once so both measurements read hot files
    graft.Tables.documents(spark, dir).count()
    val (flat, tFlat) = time(QueryPack.sequencePack(spark, dir).collect())
    val (shardRows, tShard) =
      time(QueryPack.sequencePackSharded(spark, dir, shards).collect())
    val n = graft.Tables.documents(spark, dir).count()
    println(s"""{"metric":"pack_shard","n_docs":$n,"shards":$shards,"flat_sec":${f"$tFlat%.2f"},"sharded_sec":${f"$tShard%.2f"},"flat_bins":${binSum(flat)},"sharded_bins":${binSum(shardRows)}}""")
    spark.stop()
  }
}
