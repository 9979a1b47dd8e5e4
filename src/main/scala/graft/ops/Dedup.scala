package graft.ops

import graft.functions.tx
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deduplication operators for web-scale text corpora. Exact dedup is a
 * hash group-by; near-dup is shingle→MinHash→LSH-band→bucket-join→exact
 * Jaccard verify — all shuffle-on-key plans that scale horizontally (the
 * candidate join keys are the LSH buckets, never a cross join).
 */
object Dedup {

  /** Exact duplicate groups by content hash: (text_hash, keeper_id, n). */
  def exact(df: DataFrame, text: Column, id: Column): DataFrame =
    df.groupBy(md5(text).as("text_hash"))
      .agg(min(id).as("keeper_id"), count(lit(1)).as("n"))

  /** Rows surviving exact dedup (keep min-id row per distinct text). */
  def exactSurvivors(df: DataFrame, textName: String, idName: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(md5(col(textName))).orderBy(col(idName).asc)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /**
   * MinHash+LSH near-duplicate candidate pairs, verified by exact n-gram
   * Jaccard. Returns (id_a, id_b, jaccard) with id_a < id_b and
   * jaccard >= threshold. numHashes=32, 8 bands x 4 rows targets ~0.6+
   * similarity candidates.
   */
  def minhashPairs(df: DataFrame, textName: String, idName: String,
                   numHashes: Int = 32, rowsPerBand: Int = 4, shingle: Int = 3,
                   threshold: Double = 0.6, maxBucket: Long = 10000L): DataFrame = {
    // Candidate generation shuffles ONLY (band, id) — never the text. At
    // corpus scale the text column is KBs/row and would dominate the LSH
    // band shuffle; ids are 8 bytes. Texts are re-joined just for the
    // (typically tiny) surviving candidate-pair set.
    //
    // Degenerate-bucket guards (a real web corpus is full of empty/near-
    // empty pages, which would otherwise all share the all-MaxValue
    // signature and meet in EVERY band — O(n²) candidates):
    //  1. docs with fewer than `shingle` tokens have no shingle set, hence
    //     no meaningful Jaccard — they are exact-dedup territory and are
    //     excluded from banding entirely;
    //  2. any band bucket larger than `maxBucket` is dropped from candidate
    //     generation (a count pre-pass; map-side partial agg makes it one
    //     cheap shuffle of (band, count)). Pairs in such a mega-bucket are
    //     near-certainly co-bucketed in another, sub-cap band; the cap
    //     bounds the worst case at maxBucket² per bucket instead of n².
    // persist the COMPACT (id, band) frame: it feeds the count pre-pass and
    // both self-join sides — without it the MinHash signatures (the
    // expensive per-document work) would be recomputed three times. The
    // cached rows are 16 bytes/band, orders of magnitude below the text.
    // Lifecycle: entries live until unpersist/clearCache (Spark spills this
    // level under pressure); callers invoking dedup in a LOOP should
    // spark.catalog.clearCache() between iterations.
    val sig = df.select(col(idName).as("id"),
        tx.minhash(col(textName), lit(numHashes), lit(shingle)).as("__sig"))
      .filter(element_at(col("__sig"), 1) =!= lit(Long.MaxValue))
      .select(col("id"), explode(tx.lshBands(col("__sig"), lit(rowsPerBand))).as("band"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val oversized = sig.groupBy("band").count()
      .filter(col("count") > maxBucket).select("band")
    val pruned = sig.join(broadcast(oversized), Seq("band"), "left_anti")
    val a = pruned.select(col("band"), col("id").as("id_a"))
    val b = pruned.select(col("band"), col("id").as("id_b"))
    val candidates = a.join(b, Seq("band"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")
    val texts = df.select(col(idName).as("__tid"), col(textName).as("__text"))
    candidates
      .join(texts, col("id_a") === col("__tid")).withColumnRenamed("__text", "text_a").drop("__tid")
      .join(texts, col("id_b") === col("__tid")).withColumnRenamed("__text", "text_b").drop("__tid")
      .withColumn("jaccard", tx.ngramJaccard(col("text_a"), col("text_b"), lit(shingle)))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** SimHash near-dup pairs: bucket on rotated 16-bit blocks (any pair
   *  within hamming distance <= maxHamming shares at least one of the 4
   *  blocks by pigeonhole), verify hamming. */
  def simhashPairs(df: DataFrame, textName: String, idName: String,
                   maxHamming: Int = 3, maxBucket: Long = 10000L): DataFrame = {
    // sig == 0 is the degenerate no-token signature (empty/whitespace-only
    // pages — ubiquitous in a web corpus): excluded from banding, and any
    // block bucket over `maxBucket` is dropped (same guard rationale as
    // minhashPairs: bounds the self-join at maxBucket² per bucket).
    // ONE scan emits all 4 rotated blocks per row (posexplode of a 4-array)
    // instead of a 4-way self-union re-reading and re-hashing the corpus;
    // the compact (id, sig, block) frame is persisted for the count
    // pre-pass + both self-join sides
    val blockArr = array((0 until 4).map { b =>
      concat(lit(b.toString), lit(":"),
        (shiftright(col("sig"), b * 16).bitwiseAND(lit(0xffffL))).cast("string"))
    }: _*)
    val blocks = df.select(col(idName).as("id"), tx.simhash(col(textName)).as("sig"))
      .filter(col("sig") =!= 0L)
      .select(col("id"), col("sig"), explode(blockArr).as("block"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val oversized = blocks.groupBy("block").count()
      .filter(col("count") > maxBucket).select("block")
    val pruned = blocks.join(broadcast(oversized), Seq("block"), "left_anti")
    val l = pruned.select(col("block"), col("id").as("id_a"), col("sig").as("sig_a"))
    val r = pruned.select(col("block"), col("id").as("id_b"), col("sig").as("sig_b"))
    l.join(r, Seq("block"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", tx.hamming(col("sig_a"), col("sig_b")))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /**
   * Near-duplicate clusters from a candidate-pair table: connected
   * components by iterative min-label propagation (each round every vertex
   * takes the min label in its neighborhood; converges in O(diameter)
   * rounds — near-dup components are shallow in practice). Returns
   * (id, cluster) with cluster = min id of the component. Distributed:
   * each round is one equi-join + aggregate; lineage is truncated with
   * localCheckpoint to keep plans bounded.
   */
  def clusters(pairs: DataFrame, idAName: String, idBName: String,
               maxIter: Int = 20): DataFrame = {
    val edges = pairs.select(col(idAName).as("src"), col(idBName).as("dst"))
      .union(pairs.select(col(idBName).as("src"), col(idAName).as("dst")))
      .distinct().localCheckpoint(true)
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id")).localCheckpoint(true)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val nbrMin = edges.join(labels, edges("dst") === labels("id"))
        .groupBy(col("src").as("nid")).agg(min("label").as("nlabel"))
      // the change flag rides INSIDE the eagerly-checkpointed frame, so the
      // convergence probe is a filter over materialized blocks — not a
      // second join recomputing the round
      val newLabel = least(col("label"), coalesce(col("nlabel"), col("label")))
      val next = labels.join(nbrMin, labels("id") === nbrMin("nid"), "left")
        .select(col("id"), newLabel.as("label"),
          (newLabel =!= col("label")).as("__changed"))
        .localCheckpoint(true)
      val changed = next.filter(col("__changed")).limit(1).count()
      labels = next.drop("__changed")
      converged = changed == 0
      i += 1
    }
    labels.withColumnRenamed("label", "cluster")
  }

  /** Rows surviving near-dup clustering: the min-id representative of each
    * component plus every row that appears in no candidate pair. */
  def nearDupSurvivors(df: DataFrame, idName: String, pairs: DataFrame,
                       idAName: String, idBName: String): DataFrame = {
    val cl = clusters(pairs, idAName, idBName)
    val losers = cl.filter(col("id") =!= col("cluster")).select(col("id").as("__loser"))
    df.join(losers, df(idName) === col("__loser"), "left_anti")
  }
}
