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

  /** Embedding-cosine near-duplicate pairs: LSH sign-bucket equi-join →
   *  exact cosine refine (the embedding analog of Dedup.minhashPairs; the
   *  bucket key bounds the join like the spatial cell key does). Pairs with
   *  all `bits` hyperplane signs equal are candidates; cosine >= threshold
   *  survives. Lower `bits` = higher recall, bigger buckets. */
  def nearDupPairs(df: DataFrame, vecName: String, idName: String,
                   threshold: Double, bits: Int, dim: Int): DataFrame = {
    // bucket join carries ids only (8B), vectors re-joined for the refine
    // (same shuffle-the-key-not-the-payload shape as Dedup.minhashPairs)
    val keyed = df.select(col(idName).as("id"),
      lshKey(col(vecName), bits, dim).as("__key"))
    val a = keyed.select(col("__key"), col("id").as("id_a"))
    val b = keyed.select(col("__key"), col("id").as("id_b"))
    val candidates = a.join(b, Seq("__key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
    val vecs = df.select(col(idName).as("__vid"), col(vecName).as("__vec"))
    candidates
      .join(vecs, col("id_a") === col("__vid")).withColumnRenamed("__vec", "vec_a").drop("__vid")
      .join(vecs, col("id_b") === col("__vid")).withColumnRenamed("__vec", "vec_b").drop("__vid")
      .withColumn("cos", cosine(col("vec_a"), col("vec_b")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }

  /**
   * IVF-style ANN: k-means-lite coarse quantizer (deterministic seeds from
   * the data itself: every (n/nlist)-th row by id order), assign each vector
   * to its nearest centroid (broadcast), probe the query's `nprobe` nearest
   * lists, exact re-rank inside them. The scale path: list assignment is a
   * narrow map, probing reads ~nprobe/nlist of the data.
   */
  def ivfTopK(df: DataFrame, vecName: String, idName: String,
              query: Array[Float], k: Int, nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    val spark = df.sparkSession
    // deterministic centroids: evenly-spaced rows in id order (no RNG)
    val seeds = df.select(col(idName).as("id"), col(vecName).as("v"))
      .orderBy("id").limit(nlist * 8).collect()
      .zipWithIndex.filter(_._2 % 8 == 0).map(_._1.getSeq[Float](1).toArray)
    val centroids = seeds.take(nlist)
    val bc = spark.sparkContext.broadcast(centroids)

    val assignExpr = {
      // nearest centroid id by cosine via array expressions would be O(nlist)
      // columns; a tiny scala udf keeps it readable — the per-row cost is
      // nlist * dim multiply-adds either way
      import org.apache.spark.sql.functions.udf
      udf((v: Seq[Float]) => {
        val cs = bc.value
        var best = 0; var bestScore = Double.MinValue
        var i = 0
        while (i < cs.length) {
          var dot = 0.0; var j = 0
          val c = cs(i)
          while (j < c.length && j < v.length) { dot += c(j).toDouble * v(j); j += 1 }
          if (dot > bestScore) { bestScore = dot; best = i }
          i += 1
        }
        best
      })
    }
    val listed = df.withColumn("__list", assignExpr(col(vecName)))

    val qScores = centroids.zipWithIndex.map { case (c, i) =>
      var dot = 0.0; var j = 0
      while (j < c.length && j < query.length) { dot += c(j).toDouble * query(j); j += 1 }
      (i, dot)
    }
    val probeLists = qScores.sortBy(-_._2).take(nprobe).map(_._1)

    val q = typedlit(query)
    listed.filter(col("__list").isin(probeLists: _*))
      .select(col(idName), cosine(col(vecName), q).as("cos"))
      .orderBy(col("cos").desc, col(idName).asc)
      .limit(k)
  }
}
