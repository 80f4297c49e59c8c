package graft.operators

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage timing of the MinHash-LSH pipeline at sf0.1. */
object ProfileLsh {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROFILE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.documents(spark, dir)
    println("docs=" + docs.count())
    val sig = Dedup.minHash(docs.select(col("doc_id"), col("text")), "text", 32, 2)
    time("minhash")(sig.select(col("doc_id"), col("minhash")).write.mode("overwrite").format("noop").save())
    val banded = Dedup.lshBands(sig, 8, 4).select(col("doc_id"), col("band_id"), col("bucket"))
    time("banded")(banded.write.mode("overwrite").format("noop").save())
    val a = banded.select(col("doc_id").as("id_a"), col("band_id"), col("bucket"))
    val b = banded.select(col("doc_id").as("id_b"), col("band_id"), col("bucket"))
    val candidates = a.join(b, Seq("band_id", "bucket")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").dropDuplicates("id_a", "id_b")
    println("candidates=" + time("candidates")(candidates.count()))
    val full = Dedup.nearDuplicatePairs(docs, "doc_id", "text", 32, 8, 2, 0.7)
    println("pairs=" + time("full")(full.count()))
    spark.stop()
  }
}
