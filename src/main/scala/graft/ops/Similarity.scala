package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Similarity search over an embedding column (array<float>). Brute-force
 * cosine top-k is the exact baseline; the LSH-bucketed variant is the
 * scale path (candidates restricted to matching hyperplane-sign buckets,
 * then exact re-rank — same coarse-prune/exact-refine shape as the
 * spatial joins).
 */
object Similarity {

  /** Dot product of two array<float> columns via zip_with + aggregate
   *  (codegen'd higher-order functions; deterministic left-to-right sum). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0d), (acc, v) => acc + v * v))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact brute-force top-k by cosine against one query vector. */
  def bruteTopK(df: DataFrame, vecName: String, idName: String,
                query: Array[Float], k: Int): DataFrame = {
    val q = typedlit(query)
    df.select(col(idName), cosine(col(vecName), q).as("cos"))
      .orderBy(col("cos").desc, col(idName).asc)
      .limit(k)
  }

  /** Sign-of-projection LSH bucket key: bit i = sign of dot(vec, h_i)
   *  where h_i is a deterministic ±1 hyperplane derived from (i, j) by a
   *  hash — no stored model. `dim` = embedding dimensionality. */
  def lshKey(vec: Column, bits: Int, dim: Int): Column = {
    val planes = (0 until bits).map { i =>
      val proj = aggregate(
        zip_with(vec, hyperplane(i, dim), (x, h) => x * h), lit(0.0d), (a, v) => a + v)
      when(proj > 0, lit(1L << i)).otherwise(lit(0L))
    }
    planes.reduce(_ + _)
  }

  private def hyperplane(seed: Int, dim: Int): Column = {
    // deterministic ±1 pattern per (seed, index) without a stored model
    transform(sequence(lit(0), lit(dim - 1)), j =>
      when(pmod(hash(j * 2654435761L + seed.toLong * 40503L), lit(2)) === 0, lit(1.0d)).otherwise(lit(-1.0d)))
  }

  /** ANN top-k: restrict to the query's LSH bucket, exact re-rank. Caller
   *  falls back to brute force when the bucket is too sparse (check
   *  result count). */
  def annTopK(df: DataFrame, vecName: String, idName: String,
              query: Array[Float], k: Int, bits: Int = 8): DataFrame = {
    val q = typedlit(query)
    val dim = query.length
    val keyed = df.withColumn("__key", lshKey(col(vecName), bits, dim))
    val qKey = df.sparkSession.range(1).select(lshKey(q, bits, dim).as("__qkey"))
      .head().getLong(0)
    keyed.filter(col("__key") === qKey)
      .select(col(idName), cosine(col(vecName), q).as("cos"))
      .orderBy(col("cos").desc, col(idName).asc)
      .limit(k)
  }
}
