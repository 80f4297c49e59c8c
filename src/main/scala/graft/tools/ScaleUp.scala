package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus scale-up: replicate an sf directory N× with key shifting, for
  * scale-smoke runs beyond the largest driver-provided sf (the graded
  * corpora under /root/testdata are read-only).
  *
  * Replica i shifts every key column by i·(max key + 1), so join
  * relationships (orders→customer, lineitem→orders/part/supplier,
  * events→users) hold within each replica and key spaces never collide.
  * Content columns are perturbed per replica — a replica tag appended to
  * document text, embeddings rotated by i positions — so near-dup and
  * ANN structure grows LINEARLY with the corpus instead of quadratically
  * (exact copies across replicas would make every dedup cluster N× larger
  * and pair counts N²×). Dimension tables (region/nation) stay as-is.
  *
  * Usage: runMain graft.tools.ScaleUp <srcDir> <outDir> <factor>
  */
object ScaleUp {

  // key strides from the sf0.1 corpus shape (next power of 10 above the
  // max key, so shifted ids stay human-readable)
  private val Strides = Map(
    "c_custkey" -> 100000L, "o_orderkey" -> 1000000L, "o_custkey" -> 100000L,
    "l_orderkey" -> 1000000L, "l_partkey" -> 100000L, "l_suppkey" -> 10000L,
    "p_partkey" -> 100000L, "s_suppkey" -> 10000L,
    "event_id" -> 1000000L, "user_id" -> 10000L,
    "doc_id" -> 100000L, "vec_id" -> 100000L)

  private def replicate(df: DataFrame, factor: Int)(
      perReplica: (DataFrame, Int) => DataFrame): DataFrame =
    (0 until factor).map(i => perReplica(df, i)).reduce(_ unionByName _)

  private def shiftKeys(df: DataFrame, i: Int): DataFrame =
    df.columns.foldLeft(df) { (d, c) =>
      Strides.get(c) match {
        case Some(stride) => d.withColumn(c, col(c) + lit(i * stride))
        case None         => d
      }
    }

  def main(args: Array[String]): Unit = {
    val Array(srcDir, outDir, factorS) = args.take(3)
    val factor = factorS.toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(t: String) = spark.read.parquet(s"$srcDir/$t.parquet")
    def write(t: String, df: DataFrame): Unit =
      df.write.mode("overwrite").parquet(s"$outDir/$t.parquet")

    // dimensions: fixed
    Seq("region", "nation").foreach(t => write(t, read(t)))
    // fact tables: pure key shift
    Seq("customer", "supplier", "part", "orders", "lineitem")
      .foreach(t => write(t, replicate(read(t), factor)(shiftKeys)))
    // events: the source stores ts as TIMESTAMP(NANOS), which this
    // session reads as raw LONG nanos (nanosAsLong). Writing that long
    // back verbatim would hand DuckDB a BIGINT where the original corpus
    // has a timestamp — epoch(ts) oracles would stop binding. Convert to
    // µs timestamps on write (same truncation Tables.events applies) so
    // the replica is type-identical to the source for BOTH engines.
    val ev = read("events")
    val evTyped =
      if (ev.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        ev.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      else ev
    write("events", replicate(evTyped, factor)(shiftKeys))
    // documents: shift + per-replica text tag (replica 0 byte-identical)
    write("documents", replicate(read("documents"), factor) { (df, i) =>
      val shifted = shiftKeys(df, i)
      if (i == 0) shifted
      else shifted
        .withColumn("text", concat(col("text"), lit(s" r$i")))
        .withColumn("n_chars", col("n_chars") + lit(s" r$i".length.toLong))
    })
    // embeddings: shift + rotate the vector by i positions (norm- and
    // distribution-preserving, decorrelates replicas). The dimension is
    // read from the corpus, not assumed: element_at past the array end
    // returns null with ANSI off and would silently corrupt the scaled
    // vectors. Rotation alone repeats after d steps (replicas i and i+d
    // would be byte-identical, reintroducing quadratic pair growth), so
    // replicas past the first d compose the rotation (i mod d) with a
    // deterministic ±1 sign pattern seeded by i/d — norm-preserving,
    // distinct for every replica index, and replicas < d stay
    // byte-identical to the rotation-only scheme (an sf1 built before
    // this change reproduces exactly).
    val emb = read("embeddings")
    val d = emb.select(size(col("embedding"))).first().getInt(0)
    val mixedDims = emb.filter(size(col("embedding")) =!= d).count()
    require(mixedDims == 0,
      s"$mixedDims embedding rows have dim != $d; rotation would null-pad them")
    def signAt(seed: Long, j: Int): Double = {
      var x = (seed * 0x9e3779b97f4a7c15L) ^ (j.toLong * 0xbf58476d1ce4e5b9L)
      x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
      x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
      if (((x ^ (x >>> 31)) & 1L) == 0L) 1.0 else -1.0
    }
    write("embeddings", replicate(emb, factor) { (df, i) =>
      val shifted = shiftKeys(df, i)
      if (i == 0) shifted
      else {
        val flipSeed = i / d
        val rot = (0 until d).map { j =>
          val e = element_at(col("embedding"), (j + i % d) % d + 1)
          // ±1 as a FLOAT literal: exact in either element type, and it
          // keeps array<float> corpora float (a double literal would
          // silently promote the whole column)
          if (flipSeed == 0) e else e * lit(signAt(flipSeed.toLong, j).toFloat)
        }
        shifted.withColumn("embedding", array(rot: _*))
      }
    })
    println(s"""{"scaled":"$outDir","factor":$factor}""")
    spark.stop()
  }
}
