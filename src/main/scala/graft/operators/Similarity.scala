package graft.operators

import graft.functions.{TextFunctions, VectorFunctions}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over embedding columns (Array[Float]).
  *
  * Baseline: brute-force cosine top-k (exact, O(Q·N) — fine when the query
  * set Q is small and broadcast). Scale path: random-hyperplane LSH buckets
  * so candidate generation is a keyed join, O(N) shuffle, no cartesian.
  */
object Similarity {

  /** Cosine via double accumulation in array order — bit-reproducible. */
  def cosine(a: Column, b: Column): Column = VectorFunctions.cosine(a, b)

  /** Brute-force top-k neighbors for each query vector. The query side is
    * expected to be small (broadcast); ranking is deterministic via
    * (rounded score desc, id) so results are stable under partitioning. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val c = corpus.select(col("vec_id").as("corpus_id"), col("embedding").as("c_emb"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        round(cosine(col("q_emb"), col("c_emb")), 6).as("score"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("corpus_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Deterministic pseudo-random hyperplane weight for (plane j, dim i):
    * md5-derived hash mapped into [-1, 1]. Reproducible in any engine. */
  def planeWeight(j: Column, i: Column): Column =
    ((TextFunctions.hash64(concat(j.cast(StringType), lit("_"), i.cast(StringType))) % 2001L)
      .cast(DoubleType) - 1000.0) / 1000.0

  /** Sign-bit bucket id from `nPlanes` random hyperplanes. */
  def lshBucket(emb: Column, dim: Int, nPlanes: Int): Column =
    (0 until nPlanes).map { j =>
      val planeDot = aggregate(sequence(lit(1), lit(dim)), lit(0.0),
        (s, i) => s + element_at(emb, i.cast(IntegerType)).cast(DoubleType) * planeWeight(lit(j), i))
      when(planeDot >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** LSH-bucketed near-neighbor pairs: bucket on hyperplane signs, join
    * within bucket, verify cosine ≥ threshold. */
  def lshPairs(corpus: DataFrame, dim: Int, nPlanes: Int, threshold: Double): DataFrame = {
    val b = corpus.select(col("vec_id"), col("embedding"),
      lshBucket(col("embedding"), dim, nPlanes).as("bucket"))
    val l = b.select(col("bucket"), col("vec_id").as("id_a"), col("embedding").as("emb_a"))
    val r = b.select(col("bucket"), col("vec_id").as("id_b"), col("embedding").as("emb_b"))
    l.join(r, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("bucket"), col("id_a"), col("id_b"),
        round(cosine(col("emb_a"), col("emb_b")), 6).as("score"))
      .filter(col("score") >= threshold)
  }
}
