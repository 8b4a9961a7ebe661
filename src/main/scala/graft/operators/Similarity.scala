package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`ARRAY<FLOAT>`).
  *
  * Baseline: brute-force cosine top-k (exact; one pass, no shuffle until
  * the final top-k, which TakeOrderedAndProject keeps at O(k) per
  * partition). Scale path: sign-random-projection LSH — each vector maps
  * to an `nbits`-bit bucket computed row-local from a deterministic,
  * seed-derived hyperplane matrix; search joins on the bucket (plus
  * Hamming-1 multi-probes) so the exact cosine only runs on a tiny
  * candidate set. Dot products use `zip_with`+`aggregate` (codegen'd,
  * no UDF).
  */
object Similarity {

  /** dot(a, b) in double precision, left-to-right accumulation (native
    * DotProductExpr — a `zip_with`+`aggregate` formulation runs ~64
    * interpreted lambda steps per pair). */
  def dot(a: Column, b: Column): Column =
    graft.functions.Sketch.dot_product(a, b)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))


  /** Deterministic hyperplanes for sign-LSH (fixed seed → same buckets
    * on every run / every executor).
    */
  private[graft] def hyperplanes(nbits: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(nbits, dim)(rnd.nextGaussian())
  }

  /** Row-local sign-LSH bucket id: bit j = sign(v · plane_j). */
  def signLshBucket(vec: Column, nbits: Int, dim: Int, seed: Long): Column = {
    val planes = hyperplanes(nbits, dim, seed)
    (0 until nbits).map { j =>
      when(dot(vec, typedlit(planes(j).toSeq)) > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Exact brute-force cosine top-k against one stored query vector.
    * The query row is collected (1 row) and broadcast as a literal —
    * the scan stays a single codegen'd projection + TakeOrdered.
    */
  def bruteForceTopK(emb: DataFrame, queryId: Long, k: Int,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val q = emb.filter(col(idCol) === queryId)
      .select(col(vecCol).as("qv"), l2Norm(col(vecCol)).as("qnorm"))
    emb.filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .withColumn("cos", round(
        dot(col(vecCol), col("qv")) / (l2Norm(col(vecCol)) * col("qnorm")), 6))
      .select(col(idCol), col("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** ANN top-k for a set of query ids: bucket each side, multi-probe the
    * query's bucket plus all Hamming-1 neighbors (probability amplification
    * without repartitioning the corpus), exact cosine within candidates,
    * per-query window top-k. Corpus side shuffles once on the bucket key.
    */
  def annTopK(emb: DataFrame, queryIds: Seq[Long], k: Int,
      nbits: Int = 12, dim: Int = 64, seed: Long = 42L,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val bucketed = emb.select(col(idCol).as("id"), col(vecCol).as("v"),
      l2Norm(col(vecCol)).as("norm"),
      signLshBucket(col(vecCol), nbits, dim, seed).as("bucket"))
    val probes = array(
      (col("bucket") +: (0 until nbits).map(j =>
        col("bucket").bitwiseXOR(lit(1L << j)))): _*)
    val queries = bucketed.filter(col("id").isin(queryIds: _*))
      .select(col("id").as("query_id"), col("v").as("qv"),
        col("norm").as("qnorm"), explode(probes).as("bucket"))
    queries.join(bucketed, "bucket")
      .filter(col("id") =!= col("query_id"))
      .dropDuplicates("query_id", "id")
      .withColumn("cos", round(
        dot(col("v"), col("qv")) / (col("norm") * col("qnorm")), 6))
      .withColumn("rn", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cos").desc, col("id"))))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("id").as("vec_id"), col("cos"),
        col("rn").cast("bigint").as("rn"))
  }
}
