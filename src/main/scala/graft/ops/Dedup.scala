package graft.ops

import graft.functions.tx
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deduplication operators for web-scale text corpora. Exact dedup is a
 * hash group-by; near-dup is shingle→MinHash→LSH-band→bucket-join→exact
 * Jaccard verify — all shuffle-on-key plans that scale horizontally (the
 * candidate join keys are the LSH buckets, never a cross join).
 *
 * Both near-dup paths collapse exact-duplicate texts to ONE representative
 * per group BEFORE candidate generation (one group-by on the 16-byte
 * content hash, upstream of the band/block shuffle; the text column itself
 * never shuffles): a web
 * corpus's >maxBucket cluster of byte-identical boilerplate pages (404s,
 * templates) would otherwise oversize EVERY band bucket it touches and be
 * silently dropped by the cap — exact duplicates are a group-by problem,
 * not an LSH problem. Verified pairs between representatives are expanded
 * back to all member pairs (plus the within-group pairs, which are exact
 * duplicates by construction), so the output is still the full pair set.
 *
 * Materialization policy (all compact per-doc frames go through
 * [[compactFrame]]): small inputs use a LAZY persist (no extra job — the
 * eager-checkpoint constant dominated small-corpus latency); large inputs
 * ALSO default to a lazy persist — the columnar cache ships compressed
 * batches, where an eager `localCheckpoint`'s raw-row blocks pay full
 * per-row deserialization on every remote read and measurably halve
 * multi-executor scaling (BENCH/CLUSTER.md r4). When a reliable checkpoint
 * dir is set (`sparkContext.setCheckpointDir`), big inputs upgrade to an
 * eager RELIABLE `checkpoint` instead — lineage-free AND executor-loss-safe,
 * the right default for long multi-hour cluster runs. Override either
 * choice with `spark.graft.dedup.materialize` = persist | localCheckpoint |
 * checkpoint. Blocks are freed by the ContextCleaner when the frames are
 * GC'd.
 */
object Dedup {

  /** Inputs whose optimizer-estimated size is below this skip the eager
    * checkpoint: recomputing a few MB is cheaper than the checkpoint job. */
  val SmallCorpusBytes: Long = 64L * 1024 * 1024

  /** True when the plan's estimated size crosses [[SmallCorpusBytes]];
    * unknown-size sentinels (LocalRelation, post-join frames) count as big —
    * the safe direction, matching pre-r4 behavior.
    * `spark.graft.dedup.sizeClass` = big | small overrides the estimate —
    * a test seam (the small/big paths must agree; DedupGuardRecallSpec
    * asserts parity) that also lets operators pin a path in production. */
  private def isBig(df: DataFrame): Boolean =
    df.sparkSession.conf.getOption("spark.graft.dedup.sizeClass") match {
      case Some("big") => true
      case Some("small") => false
      case Some(other) => throw new IllegalArgumentException(
        s"spark.graft.dedup.sizeClass: '$other' (expected 'big' or 'small')" +
          " — failing fast so a typo cannot silently run the other path")
      case None => df.queryExecution.optimizedPlan.stats.sizeInBytes > BigInt(SmallCorpusBytes)
    }

  /** Materialize a compact derived frame per the object-doc policy. Small
    * inputs use a LAZY persist: the fan-out branches still read cached
    * blocks, but no eager checkpoint job runs up front (measured best of
    * {eager localCheckpoint, lazy localCheckpoint, no materialization,
    * lazy persist} on the sf0.1 fixture).
    *
    * Big inputs default to PERSIST as well: the columnar cache stores
    * compressed batches, so on a multi-executor topology the fan-out
    * branches that land on other executors fetch compact column bytes —
    * the eager `localCheckpoint` alternative stores raw row objects whose
    * remote reads pay full per-row deserialization, measured to HALVE the
    * 1→4-executor scaling efficiency of the whole pipeline (0.47 vs ~0.9
    * for every individual sub-stage; BENCH/CLUSTER.md r4). Override with
    * `spark.graft.dedup.materialize` = persist | localCheckpoint |
    * checkpoint (reliable; requires `sparkContext.setCheckpointDir`,
    * executor-loss-safe — the right choice for long multi-hour runs). */
  private def compactFrame(df: DataFrame, big: Boolean): DataFrame = {
    if (!big) return df.persist()
    val mode = df.sparkSession.conf.getOption("spark.graft.dedup.materialize")
      .getOrElse(if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
        "checkpoint" else "persist")
    mode match {
      case "checkpoint" => df.checkpoint(true)
      case "localCheckpoint" => df.localCheckpoint(true)
      case "persist" => df.persist()
      case other => throw new IllegalArgumentException(
        s"spark.graft.dedup.materialize: '$other' (expected 'persist'," +
          " 'localCheckpoint' or 'checkpoint') — failing fast so a typo" +
          " cannot silently select a different materialization")
    }
  }

  /** Partition count for the SMALL path's explicit exchanges. A small
    * corpus (<64 MB) needs a few partitions for the signature pass's CPU,
    * but NOT `shuffle.partitions` of them: at 32 partitions the wall is
    * per-task dispatch overhead × tasks × stages, not work (measured ~0.9 s
    * of a 2.5 s sf0.1 minhash run). 8 caps dispatch cost while keeping the
    * only CPU-heavy leg parallel; override: `spark.graft.dedup.smallParts`. */
  private def smallParts(df: DataFrame): Int = {
    val dp = df.sparkSession.sparkContext.defaultParallelism
    math.min(dp, df.sparkSession.conf.getOption("spark.graft.dedup.smallParts")
      .map(_.toInt).getOrElse(8))
  }

  /** A small corpus usually arrives in ONE scan partition (a sub-128MB
    * parquet file), so the signature pass — the pipeline's only CPU-heavy
    * expression — would run as a single serial task. Spread it across
    * [[smallParts]] partitions BY ROW ID (uniform), not by the content
    * hash: hash-spreading sent every exact-duplicate row to ONE partition,
    * so a boilerplate-heavy corpus (the mega-cluster case minhashPairs
    * itself guards against) re-serialized the per-row signature CPU. The
    * later group-bys on `__h` (rep collapse, group sizes) pay one more
    * small exchange, but their partial aggregation collapses duplicate
    * rows per partition BEFORE it, so the skewed case ships almost
    * nothing. Big inputs already have partitions and pass through. */
  private def spreadSmall(df: DataFrame, big: Boolean, byId: Column): DataFrame =
    if (big) df else df.repartition(smallParts(df), byId)

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
   *
   * Scale shape: signatures are computed where the text lives (text never
   * shuffles), then exact-duplicate groups collapse to ONE representative
   * BEFORE banding — one group-by on the 16-byte content hash — so the band
   * shuffle that feeds the self-join carries only (band:long, rid:long,
   * __h:16B) rows. The r2 shape grouped (band, hex-string-hash, id) AFTER
   * the band explode, shuffling ~2× the bytes through two exchanges (the
   * (band,__h) group-by partitioning didn't match the window's
   * partitionBy(band), costing a second full shuffle of the band frame) —
   * the process-isolated scaling runs showed this join shuffle-volume-bound
   * at 0.47 efficiency. Guards against degenerate buckets:
   *  1. docs with fewer than `shingle` tokens have no shingle set, hence no
   *     meaningful Jaccard — excluded entirely (exact-dedup territory);
   *  2. exact-duplicate texts occupy ONE band slot via the rep collapse
   *     (see object doc) — a boilerplate mega-cluster can no longer
   *     oversize buckets;
   *  3. any band bucket still holding more than `maxBucket` DISTINCT texts
   *     is dropped from candidate generation. On the big path the guard is
   *     a broadcast ANTI join against the (near-empty) hot-band set — a
   *     partially-aggregated count over the cached reps — so the band
   *     frame stays unsorted and the self-join hash-joins it; the small
   *     path keeps the window form, which rides its explicit smallParts
   *     exchange for free.
   */
  def minhashPairs(df: DataFrame, textName: String, idName: String,
                   numHashes: Int = 32, rowsPerBand: Int = 4, shingle: Int = 3,
                   threshold: Double = 0.6, maxBucket: Long = 10000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val big = isBig(df)
    val h = unhex(md5(col(textName).cast("binary"))) // 16-byte key, not hex string
    // ONE pass over the corpus computes everything per-doc (16-byte content
    // hash + 8 band keys ≈ 90 B/row, ~0.1% of the text bytes), materialized
    // per the object-doc policy: the pipeline's DAG fans out into several
    // branches (banding, group sizes, expansion), and every branch — plus
    // every broadcast build — would otherwise re-scan the corpus and
    // re-hash every document (measured: 4-5 full corpus passes)
    val base = compactFrame(spreadSmall(
        df.select(col(idName).as("id"), h.as("__h"), col(textName).as("__t0")),
        big, col("id"))
      .select(col("id"), col("__h"),
        (if (big) lit(null).cast("string") else col("__t0")).as("__text"),
        tx.minhash(col("__t0"), lit(numHashes), lit(shingle)).as("__sig"))
      .select(col("id"), col("__h"), col("__text"),
        when(element_at(col("__sig"), 1) =!= lit(Long.MaxValue),
          tx.lshBands(col("__sig"), lit(rowsPerBand))).as("__bands")), big)
    val members = base.select("id", "__h")
    // identical texts have identical signatures hence identical bands, so
    // any group member's BAND ARRAY represents the group; sub-shingle docs
    // (null bands — no shingle set, exact-dedup territory) never band
    val banded = base.filter(col("__bands").isNotNull)
    // min(struct(...)) — NOT first(): first() is a non-deterministic
    // aggregate in Spark, which blocks exchange reuse, so the self-join
    // below would compute the whole sig→collapse→band subtree TWICE
    // (measured 2.5x wall on the full pipeline); min over the struct is
    // deterministic (id is unique) and keeps ReusedExchange eligible.
    // Small corpora carry the text through the collapse (id is the struct's
    // leading field, so min() never compares text bytes) — see below.
    val reps = banded.groupBy("__h")
      .agg(min(struct(col("id"), col("__bands"), col("__text"))).as("__m"))
      .select(col("__m.id").as("rid"), col("__m.__bands").as("__bands"),
        col("__m.__text").as("__rtext"))
    // the band shuffle (the pipeline's dominant exchange at scale — the
    // window count AND both self-join sides repartition on `band`) carries
    // ONLY (band:long, rid:long): the 16-byte group hash is functionally
    // determined by rid and is re-attached AFTER candidate generation from
    // the compact cached frame — halving the exchange bytes vs shipping
    // __h through it (the r3 process-isolated scaling runs measured this
    // join shuffle-volume-bound). SMALL corpora instead carry the text
    // itself through the band shuffle: the two text re-join stages (each a
    // serial broadcast build + exchange) dominate small-input latency, and
    // a few hundred docs × 8 bands of text bytes cost nothing to shuffle.
    val repPairs = if (big) {
      val bands = reps.select(col("rid"), explode(col("__bands")).as("band"))
      // bucket guard as a hot-band BROADCAST ANTI JOIN, not a window: the
      // window rode the band exchange but forced a full SORT of the
      // 8×-exploded band frame on every side; `> maxBucket` leaves a
      // near-empty hot set, so a partially-aggregated count (map-side
      // combine over the cached reps) costs one tiny shuffle and the
      // self-join below can then HASH-join the unsorted band frame — the
      // 32M-row sorts were a top-3 CPU stage of the 4M-doc pipeline
      val hot = bands.groupBy("band").agg(count(lit(1)).as("__bc"))
        .filter(col("__bc") > maxBucket).select("band")
      val guarded = bands.join(broadcast(hot), Seq("band"), "left_anti")
      // both join inputs are the same subtree — the band exchange is
      // planned once and reused; SHUFFLE_HASH skips the per-side sorts
      val candidates = compactFrame(guarded.as("a").hint("shuffle_hash")
        .join(guarded.as("b"),
          col("a.band") === col("b.band") && col("a.rid") < col("b.rid"))
        .select(col("a.rid").as("rid_a"), col("b.rid").as("rid_b"))
        .dropDuplicates("rid_a", "rid_b"), big)
      // verify via PRE-SHINGLED sets: one corpus scan computes each
      // candidate doc's sorted shingle-hash array (the semi join filters
      // BEFORE the shingling projection, so only docs appearing in a
      // candidate pair pay it, each exactly once); scoring a pair is then
      // a linear merge of two sorted arrays. The per-pair ngram_jaccard
      // alternative re-tokenized both texts for EVERY pair — a doc in k
      // pairs paid the shingling k times, the pipeline's dominant CPU.
      val ids = candidates.select(col("rid_a").as("__tid"))
        .union(candidates.select(col("rid_b").as("__tid"))).distinct()
      val sh = df.select(col(idName).as("__tid"), col(textName).as("__tx"))
        .join(ids, Seq("__tid"), "left_semi")
        .select(col("__tid"), tx.shingleHashes(col("__tx"), lit(shingle)).as("__sh"))
      candidates
        .join(sh.select(col("__tid").as("rid_a"), col("__sh").as("__sha")), Seq("rid_a"))
        .join(sh.select(col("__tid").as("rid_b"), col("__sh").as("__shb")), Seq("rid_b"))
        .withColumn("jaccard", tx.sortedJaccard(col("__sha"), col("__shb")))
        .filter(col("jaccard") >= threshold)
        .select(col("rid_a"), col("rid_b"), col("jaccard"))
    } else {
      // explicit smallParts exchanges (band, then pair keys): the window,
      // BOTH self-join sides and the dedupe group-by all cluster on a
      // subset of these keys, so Catalyst inserts no further exchange and
      // no stage fans out to shuffle.partitions tasks — on a 5k-doc corpus
      // the dispatch overhead of 32-task stages was ~40% of the wall
      val bands = reps.select(col("rid"), col("__rtext"), explode(col("__bands")).as("band"))
        .repartition(smallParts(df), col("band"))
      val guarded = bands
        .withColumn("__bc", count(lit(1)).over(Window.partitionBy("band")))
        .filter(col("__bc") <= maxBucket).drop("__bc")
      // jaccard is functionally determined by (rid_a, rid_b), so computing
      // it before the dedupe is deterministic
      guarded.as("a").join(guarded.as("b"),
          col("a.band") === col("b.band") && col("a.rid") < col("b.rid"))
        .select(col("a.rid").as("rid_a"), col("b.rid").as("rid_b"),
          tx.ngramJaccard(col("a.__rtext"), col("b.__rtext"), lit(shingle)).as("jaccard"))
        .filter(col("jaccard") >= threshold)
        .repartition(smallParts(df), col("rid_a"), col("rid_b"))
        .dropDuplicates("rid_a", "rid_b")
    }
    // multi-member groups come straight off the materialized compact frame
    // (group members are byte-identical, so any member's bandability flag
    // is the group's) — a 24-byte-row group-by over cached blocks, never a
    // second corpus pass
    val multiHashes = multiGroupHashes(
      base.select(col("__h"), col("__bands").isNotNull.as("__ok")), big)
    expandGroups(members, multiHashes, repPairs, "jaccard", lit(1.0), big)
  }

  /** SimHash near-dup pairs: bucket on rotated 16-bit blocks (any pair
   *  within hamming distance <= maxHamming shares at least one of the 4
   *  blocks by pigeonhole), verify hamming. Same group-collapse +
   *  windowed-bucket-guard shape as [[minhashPairs]]; sig == 0 (the
   *  degenerate no-token signature of empty/whitespace pages) is excluded. */
  def simhashPairs(df: DataFrame, textName: String, idName: String,
                   maxHamming: Int = 3, maxBucket: Long = 10000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val big = isBig(df)
    val h = unhex(md5(col(textName).cast("binary"))) // 16-byte key, not hex string
    // one corpus pass, materialized per the object-doc policy (32 B/row) —
    // same rationale as minhashPairs: the DAG fans out and every
    // branch/broadcast build would re-scan and re-hash the corpus otherwise
    val base = compactFrame(spreadSmall(
        df.select(col(idName).as("id"), h.as("__h"), col(textName).as("__t0")),
        big, col("id"))
      .select(col("id"), col("__h"), tx.simhash(col("__t0")).as("sig")), big)
    val members = base.select("id", "__h")
    val sigs = base.filter(col("sig") =!= 0L)
    // identical texts share the signature: collapse to one representative
    // per exact-text group BEFORE blocking (same shape as minhashPairs)
    // min(struct(...)) not first() — same exchange-reuse rationale as
    // minhashPairs (first() is non-deterministic and blocks reuse)
    val reps = sigs.groupBy("__h")
      .agg(min(struct(col("id"), col("sig"))).as("__m"))
      .select(col("__m.id").as("rid"), col("__m.sig").as("rsig"))
    // ONE scan emits all 4 rotated blocks per row (no 4-way self-union);
    // block key is a LONG — bits 0..15 the slice, bits 16..17 the slice
    // index (disjoint keyspace per block, no string concat in the shuffle).
    // The block shuffle carries ONLY (block:long, rid:long) — the 16-byte
    // group hash and the 8-byte signature are functionally determined by
    // rid and re-attached after candidate generation (same shuffle-slimming
    // as minhashPairs; rid→rsig comes from the tiny `reps` frame, a
    // group-by over cached base blocks)
    val blockArr = array((0 until 4).map { b =>
      shiftright(col("rsig"), b * 16).bitwiseAND(lit(0xffffL))
        .bitwiseOR(lit(b.toLong << 16))
    }: _*)
    // big corpora slim the block shuffle to (block, rid) and re-attach the
    // signature via two equi-joins on the tiny reps frame; SMALL corpora
    // carry the 8-byte rsig through the shuffle instead — the two join
    // stages (each a serial broadcast build + exchange) dominate small-
    // input latency, and doubling a 16-byte row on 500 docs costs nothing
    val blocks =
      if (big) reps.select(col("rid"), explode(blockArr).as("block"))
      // explicit smallParts exchange on the block key — the window and both
      // self-join sides reuse it (same dispatch-overhead rationale as the
      // minhash small path)
      else reps.select(col("rid"), col("rsig"), explode(blockArr).as("block"))
        .repartition(smallParts(df), col("block"))
    val guarded = blocks
      .withColumn("__bc", count(lit(1)).over(Window.partitionBy("block")))
      .filter(col("__bc") <= maxBucket).drop("__bc")
    // one rep per group hash ⇒ (rid_a, rid_b) dedupe ≡ the old (ha, hb) one
    val repPairs = if (big) {
      val candidates = guarded.as("a").join(guarded.as("b"),
          col("a.block") === col("b.block") && col("a.rid") < col("b.rid"))
        .select(col("a.rid").as("rid_a"), col("b.rid").as("rid_b"))
        .dropDuplicates("rid_a", "rid_b")
      val lut = reps
      candidates
        .join(lut.select(col("rid").as("rid_a"), col("rsig").as("sig_a")), Seq("rid_a"))
        .join(lut.select(col("rid").as("rid_b"), col("rsig").as("sig_b")), Seq("rid_b"))
        .withColumn("hamming", tx.hamming(col("sig_a"), col("sig_b")))
        .filter(col("hamming") <= maxHamming)
        .select("rid_a", "rid_b", "hamming")
    } else {
      // hamming is functionally determined by (rid_a, rid_b), so computing
      // it before the dedupe is deterministic
      guarded.as("a").join(guarded.as("b"),
          col("a.block") === col("b.block") && col("a.rid") < col("b.rid"))
        .select(col("a.rid").as("rid_a"), col("b.rid").as("rid_b"),
          tx.hamming(col("a.rsig"), col("b.rsig")).as("hamming"))
        .filter(col("hamming") <= maxHamming)
        .repartition(smallParts(df), col("rid_a"), col("rid_b"))
        .dropDuplicates("rid_a", "rid_b")
    }
    val multiHashes = multiGroupHashes(
      base.select(col("__h"), (col("sig") =!= 0L).as("__ok")), big)
    expandGroups(members, multiHashes, repPairs, "hamming", lit(0), big)
  }

  /** Group hashes with ≥2 members whose (byte-identical) members banded —
    * the groups that can contribute within-pairs. One 24-byte-row group-by
    * over the caller's materialized frame; materialized itself (one tiny
    * row per multi-member group) because it is rebuilt inside every
    * downstream broadcast build and its emptiness steers the expansion. */
  private def multiGroupHashes(flagged: DataFrame, big: Boolean): DataFrame =
    compactFrame(flagged.groupBy("__h")
      .agg(count(lit(1)).as("__g"), min(col("__ok")).as("__ok"))
      .filter(col("__g") >= 2 && col("__ok"))
      .select("__h"), big)

  /**
   * Expand verified representative pairs back to member-id pairs:
   * within-group pairs (exact duplicates — similarity = `withinSim` by
   * construction) plus the cross product of the two member sets for every
   * verified cross-group pair (identical texts per group ⇒ the pair
   * similarity is the representatives'). All joins are equi-keyed on the
   * 16-byte group hash; output size is the true answer size.
   *
   * `multiHashes` is the set of group hashes with ≥2 members — in a
   * mostly-unique corpus it is near-empty, so the expansion machinery
   * (the within self-join and the two cross joins, which a first cut ran
   * over ALL members — a measured 2x of the whole pipeline's wall time)
   * touches only the rows that can actually expand; a singleton group's
   * member IS its representative, recovered by the left-join coalesce.
   */
  private def expandGroups(members: DataFrame, multiHashes: DataFrame,
                           repPairs: DataFrame, simName: String,
                           withinSim: Column, big: Boolean): DataFrame = {
    // multiHashes arrives materialized (tiny), so its emptiness is a free
    // driver-side fact: a mostly-unique corpus — the common case — has no
    // multi-member groups, every representative is its group's only
    // member, and the whole expansion machinery (the hash re-attach, the
    // within self-join and two cross joins, each of whose broadcast builds
    // re-executes its subtree) is skipped outright
    if (multiHashes.isEmpty) {
      return repPairs.select(least(col("rid_a"), col("rid_b")).as("id_a"),
        greatest(col("rid_a"), col("rid_b")).as("id_b"), col(simName))
    }
    // dup-heavy path: re-attach the group hashes the candidate shuffle no
    // longer carries — repPairs is the tiny verified set, so each join
    // broadcasts it against one cached-block scan of `members`
    val withH = repPairs
      .join(members.select(col("id").as("rid_a"), col("__h").as("ha")), Seq("rid_a"))
      .join(members.select(col("id").as("rid_b"), col("__h").as("hb")), Seq("rid_b"))
    // m2 (members of multi-groups) feeds three broadcast builds;
    // materialized so they read cached blocks instead of re-running the
    // semi-join per build (blocks freed on GC)
    // multiHashes is a group-by output — already distinct; a .distinct()
    // here would be a whole extra exchange+aggregate for nothing
    val m2 = compactFrame(
      members.join(multiHashes, Seq("__h"), "left_semi"), big)
    val within = m2.as("x").join(m2.as("y"),
        col("x.__h") === col("y.__h") && col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"), withinSim.as(simName))
    val cross = withH
      .join(m2.select(col("__h").as("ha"), col("id").as("__ia")), Seq("ha"), "left")
      .join(m2.select(col("__h").as("hb"), col("id").as("__ib")), Seq("hb"), "left")
      .select(least(coalesce(col("__ia"), col("rid_a")), coalesce(col("__ib"), col("rid_b"))).as("id_a"),
        greatest(coalesce(col("__ia"), col("rid_a")), coalesce(col("__ib"), col("rid_b"))).as("id_b"),
        col(simName))
    within.union(cross)
  }

  /**
   * Near-duplicate clusters from a candidate-pair table: connected
   * components by iterative min-label propagation with pointer jumping
   * (each round every vertex takes the min label in its neighborhood,
   * then follows one hop of the label table; converges in O(log diameter)
   * rounds). Returns
   * (id, cluster) with cluster = min id of the component. Distributed:
   * each round is one equi-join + aggregate; lineage is truncated with
   * localCheckpoint to keep plans bounded.
   */
  def clusters(pairs: DataFrame, idAName: String, idBName: String,
               maxIter: Int = 20): DataFrame = {
    // partition ONCE on the keys every round reuses: edges by dst and
    // labels by id (the join keys — SMJ then needs no per-round exchange;
    // the one exchange per round is the groupBy(src)). Small edge sets use
    // smallParts-many partitions — each round is several stages over an
    // already-tiny frame, and 32-task dispatch per stage dominated the
    // wall — big ones the session's shuffle parallelism.
    val parts =
      if (isBig(pairs)) pairs.sparkSession.sessionState.conf.numShufflePartitions
      else smallParts(pairs)
    val edges = pairs.select(col(idAName).as("src"), col(idBName).as("dst"))
      .union(pairs.select(col(idBName).as("src"), col(idAName).as("dst")))
      .repartition(parts, col("dst"))
      .distinct().localCheckpoint(true)
    var labels = edges.select(col("src").as("id"))
      .repartition(parts, col("id")).distinct()
      .withColumn("label", col("id")).localCheckpoint(true)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val nbrMin = edges.join(labels, edges("dst") === labels("id"))
        .repartition(parts, col("src"))
        .groupBy(col("src").as("nid")).agg(min("label").as("nlabel"))
      val stepped = labels.join(nbrMin, labels("id") === nbrMin("nid"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"),
          col("label").as("__prev"))
      // pointer jump: label <- label(label). Labels are vertex ids and
      // monotone non-increasing, so following one hop of the previous
      // round's table stays inside the component and (combined with the
      // neighborhood step) roughly halves the remaining diameter each
      // round — O(log d) rounds where plain propagation needs O(d). On a
      // chain-shaped component (the dedup gate's worst case) this is the
      // difference between ~20 and ~5 rounds of stage dispatch.
      val jumped = stepped.as("s")
        .join(labels.select(col("id").as("__pid"), col("label").as("__plbl")).as("p"),
          col("s.label") === col("__pid"), "left")
      val finalLabel = least(col("s.label"), coalesce(col("__plbl"), col("s.label")))
      // the change flag rides INSIDE the eagerly-checkpointed frame, so the
      // convergence probe is a filter over materialized blocks — not a
      // second join recomputing the round
      val next = jumped
        .select(col("s.id").as("id"), finalLabel.as("label"),
          (finalLabel =!= col("__prev")).as("__changed"))
        // the jump join leaves the frame keyed on LABEL; re-key on id so
        // the next round's two joins on labels("id") see the partitioning
        // the loop was designed around instead of re-exchanging the table
        .repartition(parts, col("id"))
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
