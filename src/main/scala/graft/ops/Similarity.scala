package graft.ops

import graft.functions.{vx, VecRT}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Similarity search over an embedding column (array<float>). Brute-force
 * cosine top-k is the exact baseline; the LSH-bucketed variant is the
 * scale path (candidates restricted to matching hyperplane-sign buckets,
 * then exact re-rank — same coarse-prune/exact-refine shape as the
 * spatial joins). Bucket keys come from the codegen'd [[graft.functions.LshKey]]
 * expression; the SAME kernel runs driver-side for query keys, so no
 * planning job is ever launched.
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

  /**
   * ANN top-k: restrict to the query's multiprobe LSH bucket set (base
   * bucket + the nprobe-1 most-likely sign flips), exact re-rank inside.
   * The query's keys are computed ON THE DRIVER by the same kernel the
   * executors run — no 1-row Spark job. Callers needing guaranteed k
   * results check the count and fall back to [[bruteTopK]].
   */
  def annTopK(df: DataFrame, vecName: String, idName: String,
              query: Array[Float], k: Int, bits: Int = 16, nprobe: Int = 4): DataFrame = {
    val q = typedlit(query)
    val probeKeys = VecRT.lshProbes(query, bits, nprobe)
    df.withColumn("__key", vx.lshKey(col(vecName), lit(bits)))
      .filter(col("__key").isin(probeKeys: _*))
      .select(col(idName), cosine(col(vecName), q).as("cos"))
      .orderBy(col("cos").desc, col(idName).asc)
      .limit(k)
  }

  /**
   * Embedding-cosine near-duplicate pairs: multiprobe LSH sign-bucket
   * equi-join → exact cosine refine (the embedding analog of
   * Dedup.minhashPairs). One side explodes its probe keys, the other
   * keeps its base key, so a pair is a candidate when EITHER vector's
   * probe set hits the other's bucket — recall survives realistic `bits`
   * (buckets must scale with corpus size: 2^bits ≳ n/1000, or every
   * bucket join degenerates toward all-pairs).
   */
  def nearDupPairs(df: DataFrame, vecName: String, idName: String,
                   threshold: Double, bits: Int = 16, nprobe: Int = 3): DataFrame = {
    // bucket join carries ids only (8B), vectors re-joined for the refine
    // (same shuffle-the-key-not-the-payload shape as Dedup.minhashPairs)
    val a = df.select(col(idName).as("id_a"),
        explode(vx.lshProbes(col(vecName), lit(bits), lit(nprobe))).as("__key"))
    val b = df.select(col(idName).as("id_b"),
        vx.lshKey(col(vecName), lit(bits)).as("__key"))
    // canonicalize AFTER the join: the probe→base hit can arrive in either
    // orientation (X's probes hitting Y's bucket or vice versa) and the two
    // orientations are NOT symmetric — filtering on id_a < id_b before
    // canonicalizing would drop pairs found only in the higher-id direction
    val candidates = a.join(b, Seq("__key"))
      .filter(col("id_a") =!= col("id_b"))
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"))
      .dropDuplicates("id_a", "id_b") // a pair can collide in several probes
    val vecs = df.select(col(idName).as("__vid"), col(vecName).as("__vec"))
    candidates
      .join(vecs, col("id_a") === col("__vid")).withColumnRenamed("__vec", "vec_a").drop("__vid")
      .join(vecs, col("id_b") === col("__vid")).withColumnRenamed("__vec", "vec_b").drop("__vid")
      .withColumn("cos", cosine(col("vec_a"), col("vec_b")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }

  /**
   * IVF-style ANN with a TRAINED coarse quantizer: deterministic Lloyd
   * iterations (k-means on unit-normalized vectors) over a bounded
   * id-ordered sample, then assign each vector to its nearest centroid
   * (broadcast), probe the query's `nprobe` nearest lists, exact re-rank
   * inside them. The scale path: list assignment is a narrow map, probing
   * reads ~nprobe/nlist of the data.
   */
  def ivfTopK(df: DataFrame, vecName: String, idName: String,
              query: Array[Float], k: Int, nlist: Int = 16, nprobe: Int = 4,
              trainIters: Int = 4): DataFrame = {
    val spark = df.sparkSession
    // bounded deterministic training sample, spread by HASH of the id (an
    // id-order prefix trains on one corner of the space when ids correlate
    // with content — data written sorted/clustered by topic is the norm)
    val sample = df.select(col(idName).as("id"), col(vecName).as("v"))
      .orderBy(pmod(hash(col("id")), lit(1000003)).asc, col("id").asc)
      .limit(nlist * 128).collect()
      .map(_.getSeq[Float](1).toArray)
    val centroids = trainCentroids(sample, nlist, trainIters)
    val bc = spark.sparkContext.broadcast(centroids)

    val assignExpr = {
      // nearest centroid id by dot product; a tiny scala udf keeps it
      // readable — the per-row cost is nlist * dim multiply-adds either way
      import org.apache.spark.sql.functions.udf
      udf((v: Seq[Float]) => nearestCentroid(bc.value, v))
    }
    val listed = df.withColumn("__list", assignExpr(col(vecName)))

    val qScores = centroids.zipWithIndex.map { case (c, i) => (i, dotF(c, query)) }
    val probeLists = qScores.sortBy(-_._2).take(nprobe).map(_._1)

    val q = typedlit(query)
    listed.filter(col("__list").isin(probeLists: _*))
      .select(col(idName), cosine(col(vecName), q).as("cos"))
      .orderBy(col("cos").desc, col(idName).asc)
      .limit(k)
  }

  private def dotF(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0; var j = 0
    val n = math.min(a.length, b.length)
    while (j < n) { d += a(j).toDouble * b(j); j += 1 }
    d
  }

  private def normalize(v: Array[Float]): Array[Float] = {
    val n = math.sqrt(dotF(v, v))
    if (n == 0) v else v.map(x => (x / n).toFloat)
  }

  private[ops] def nearestCentroid(cs: Array[Array[Float]], v: Seq[Float]): Int = {
    var best = 0; var bestScore = Double.MinValue
    var i = 0
    while (i < cs.length) {
      var d = 0.0; var j = 0
      val c = cs(i)
      while (j < c.length && j < v.length) { d += c(j).toDouble * v(j); j += 1 }
      if (d > bestScore) { bestScore = d; best = i }
      i += 1
    }
    best
  }

  /** Deterministic k-means-lite with model selection: Lloyd runs from
    * several strided seed offsets; keep the run with the highest total
    * sample-to-centroid similarity (lowest quantization error). All
    * restarts are deterministic, so the trained model is reproducible;
    * empty clusters keep their previous centroid. */
  private[ops] def trainCentroids(sample: Array[Array[Float]], nlist: Int,
                                  iters: Int, restarts: Int = 3): Array[Array[Float]] = {
    require(sample.nonEmpty, "empty training sample")
    val k = math.min(nlist, sample.length)
    val dim = sample(0).length
    def lloyd(seedOffset: Int): (Array[Array[Float]], Double) = {
      val step = math.max(1, sample.length / k)
      var cents = Array.tabulate(k)(i =>
        normalize(sample((seedOffset + i * step) % sample.length)))
      var it = 0
      while (it < iters) {
        val sums = Array.fill(cents.length, dim)(0.0)
        val counts = new Array[Int](cents.length)
        sample.foreach { v =>
          val c = nearestCentroid(cents, v)
          var j = 0
          while (j < dim && j < v.length) { sums(c)(j) += v(j); j += 1 }
          counts(c) += 1
        }
        cents = cents.zipWithIndex.map { case (old, i) =>
          if (counts(i) == 0) old
          else normalize(sums(i).map(_.toFloat))
        }
        it += 1
      }
      val quality = sample.foldLeft(0.0)((acc, v) =>
        acc + dotF(cents(nearestCentroid(cents, v)), normalize(v)))
      (cents, quality)
    }
    val offsets = (0 until math.max(1, restarts)).map(r => r * (sample.length / (3 * k) + 1))
    offsets.map(lloyd).maxBy(_._2)._1
  }
}
