package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Leakage-free (group-aware) dataset splitting.
  *
  * q46's content-hash split is reproducible but leaks: near-duplicates
  * differ in text, so their buckets are independent and a third of
  * 2-doc clusters straddle train/eval (q128 measures exactly that).
  * The group-aware split closes the loop the audit opens — it assigns
  * the SPLIT per near-dup CLUSTER, not per document, so the leakage
  * q128 audits is zero by construction:
  *
  *  1. connected components over the near-dup pair list (q45's graph)
  *     give each clustered doc its component's min id as `cluster_id`;
  *     un-paired docs are their own singleton cluster;
  *  2. the split bucket is the cluster REPRESENTATIVE's bucket (the
  *     min-id member's content hash), applied to every member.
  *
  * Keying on the representative's content keeps the q46 determinism
  * contract (rerunning on a repartitioned corpus, or in another engine,
  * reproduces the split) and adds a stability property q46 lacks:
  * ingesting a near-duplicate of an existing doc can never MOVE that
  * doc's split — the new arrival joins the existing cluster, whose
  * representative (the min id, i.e. the earliest member) and therefore
  * whose bucket is unchanged.
  *
  * Scale shape: the per-doc bucket is computed map-side BEFORE any
  * shuffle, so text never moves; the component graph is ids-only
  * (post-LSH pair lists are a sliver of the corpus — see
  * [[Dedup.connectedComponents]]'s adaptive path); the representative
  * lookup is an ids-only self-semi-join on `cluster_id` followed by an
  * id equi-join back — three 16-byte-row exchanges at corpus
  * cardinality, nothing wider.
  */
object Splits {

  /** Assign every document to a split such that near-dup clusters
    * never straddle splits.
    *
    * @param docs one row per document, carrying `idCol` (long) and
    *             `bucketCol` (an int in [0, 100) — e.g. q46's
    *             `fnv64(text) & 0x7FFFFFFF % 100`, computed map-side
    *             by the caller so this operator stays hash-agnostic)
    * @param pairs near-dup pairs over the same ids (`aCol`, `bCol`) —
    *              any of the LSH/exact pair families
    * @param trainPct bucket cut for "train" (default 80)
    * @param validPct additional bucket width for "valid" (default 10);
    *                 the remainder is "test"
    * @return (idCol, cluster_id, split) — one row per input doc
    */
  def groupAwareSplit(docs: DataFrame, pairs: DataFrame,
                      idCol: String, bucketCol: String,
                      aCol: String = "id_a", bCol: String = "id_b",
                      trainPct: Int = 80, validPct: Int = 10): DataFrame = {
    require(trainPct > 0 && validPct >= 0 && trainPct + validPct <= 100,
      s"invalid split cuts: train $trainPct / valid $validPct")
    val clusters = Dedup.connectedComponents(pairs, aCol, bCol)
    val assigned = docs.select(col(idCol), col(bucketCol).as("bucket"))
      .join(clusters, docs(idCol) === clusters("node"), "left")
      .select(col(idCol),
        coalesce(col("cluster_id"), col(idCol)).as("cluster_id"),
        col("bucket"))
    // the representative IS the min-id member, so cluster_id picks it
    val repBucket = assigned
      .filter(col(idCol) === col("cluster_id"))
      .select(col("cluster_id"), col("bucket").as("rep_bucket"))
    assigned.drop("bucket")
      .join(repBucket, Seq("cluster_id"))
      .select(col(idCol), col("cluster_id"),
        when(col("rep_bucket") < trainPct, "train")
          .when(col("rep_bucket") < trainPct + validPct, "valid")
          .otherwise("test").as("split"))
  }
}
