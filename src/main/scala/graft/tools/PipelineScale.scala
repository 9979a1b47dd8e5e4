package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

import graft.functions.tx
import graft.pages.WebPages
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * The composed 100-TB-shape pipeline at bench scale (VERDICT r4 task 8):
 * every tier is proven separately (CLUSTER.md, LAYOUT40M.md, the gate
 * queries); this main chains them into ONE lineage over the 40M-row page
 * generator and records per-stage rows/s plus the write manifest's
 * lineage metrics in a single report.
 *
 * Lineage (linear — each stage consumes the previous one's output):
 *   1. geoparse      40M pages (url-keyed LCG geoparse projection)
 *   2. text filter   4M-doc text tier: quality score + language ID
 *   3. minhash dedup near-dup pairs → connected components → removals
 *   4. embedding ann 2M-vector tier: LSH near-dup pairs → more removals
 *   5. layout write  pages ANTI JOIN removals → cell-keyed resumable write
 *   6. pruned read   hot-city query box over the written layout
 *   7. spatial join  pruned pages × region polygons (contains + refine)
 *   8. resume        second write invocation is a manifest no-op
 *
 *   sbt "runMain graft.tools.PipelineScale 40000000 /tmp/graft_pipe40m"
 */
object PipelineScale {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(40000000L)
    val outDir = args.lift(1).getOrElse("/tmp/graft_pipe40m")
    val report = args.lift(2).getOrElse("BENCH/PIPELINE40M.md")
    val docRows = math.max(1000L, rows / 10)
    val vecRows = math.max(1000L, rows / 20)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

    // heap: setting spark.driver.memory from inside an already-running JVM
    // is a no-op in local mode — size the forked JVM via the SPARK_DRIVER_MEM
    // env var (build.sbt turns it into -Xmx); 24g fits the 40M default
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.install(spark)

    case class Stage(name: String, inRows: Long, outRows: Long, sec: Double,
                     note: String = "") {
      def rps: Double = inRows / sec
    }
    val stages = scala.collection.mutable.ArrayBuffer[Stage]()
    def time[T](name: String, inRows: Long, note: String = "")(body: => (Long, T)): T = {
      val t0 = System.nanoTime()
      val (out, v) = body
      stages += Stage(name, inRows, out, (System.nanoTime() - t0) / 1e9, note)
      v
    }

    // 1. geoparse: the LCG lon/lat projection over the page stream (the
    // text column is never touched — byte-identical-text invariant).
    // The probe aggregates a hash of every derived column so column
    // pruning cannot drop the projection being measured (a bare count
    // collapses to a Range count and times nothing).
    val pages = WebPages.syntheticPages(spark, rows, partitions = 128)
    time("geoparse", rows, "projection forced via hash fold, no row shuffle") {
      // bit_xor, not sum: a 40M-row sum of xxhash64 longs overflows ANSI
      val r = pages.agg(count(lit(1)),
        expr("bit_xor(xxhash64(doc_id, lon, lat, sec, geom))")).head()
      (r.getLong(0), ())
    }

    // 2. text-quality filter on the document tier (docs 0..docRows share
    // doc_id space with the first pages)
    val docs = WebPages.syntheticDocs(spark, docRows, partitions = 128)
    val scored = docs
      .withColumn("q", tx.qualityScore(col("text")))
      .withColumn("lang", tx.langGuess(col("text")))
      .filter(col("q") > 0.1)
    val kept = time("quality_filter", docRows, "codegen'd exprs, narrow") {
      // count() alone would let pruning skip langGuess (only q feeds the
      // filter); fold lang into a hash so the stage runs what it claims
      val r = scored.agg(count(lit(1)), expr("bit_xor(xxhash64(lang))")).head()
      val n = r.getLong(0); (n, n)
    }

    // 3. minhash near-dup removal over the filtered docs
    val removalsText = time("minhash_dedup", kept, "LSH bands + CC clusters") {
      val pairs = graft.ops.Dedup.minhashPairs(scored, "text", "doc_id")
      val cl = graft.ops.Dedup.clusters(pairs, "id_a", "id_b")
      // removal set = every member that is not its cluster representative
      val rm = cl.filter(col("id") =!= col("cluster")).select(col("id").as("doc_id"))
        .persist()
      (rm.count(), rm)
    }

    // 4. embedding near-dup on the vector tier: every 29th vector is a
    // lightly-perturbed copy of its predecessor (planted near-duplicates)
    val emb = spark.range(0, vecRows, 1, 128)
      .selectExpr("id AS vec_id",
        "CASE WHEN id % 29 = 0 AND id > 0 THEN id - 1 ELSE id END AS seed",
        "CAST((id % 29 = 0 AND id > 0) AS INT) AS isdup")
      .withColumn("vec", expr(
        // Murmur3 per (seed, dim) — NOT an LCG sawtooth: a linear-mod
        // generator makes every vector a phase shift of one arithmetic
        // progression and near-collides the whole corpus under cosine
        """transform(sequence(0, 15), j ->
          |  CAST(hash(seed, j) / 2147483648e0
          |       + isdup * 1e-3 AS FLOAT))""".stripMargin))
      .select("vec_id", "vec")
    // buckets must scale with the corpus (2^bits ≈ 2n keeps in-bucket
    // candidate pairs ~n/2; a fixed small bits makes them quadratic —
    // measured OOM at 2M vectors with bits=14: ~122 vectors/bucket)
    val annBits = math.max(14, (math.log(vecRows.toDouble * 2) / math.log(2)).ceil.toInt)
    val removalsVec = time("embedding_ann", vecRows, s"multiprobe sign-LSH, bits=$annBits") {
      val pairs = graft.ops.Similarity.nearDupPairs(emb, "vec", "vec_id",
        threshold = 0.999, bits = annBits, nprobe = 4)
      val rm = pairs.select(greatest(col("id_a"), col("id_b")).as("doc_id"))
        .distinct().persist()
      (rm.count(), rm)
    }

    // 5. layout write of the deduplicated page stream: pages whose doc_id
    // is in either removal set drop out via one ANTI JOIN (removal frames
    // are small → broadcast), everything else cell-keys and writes
    val removals = removalsText.union(removalsVec)
    val cleanPages = pages.join(broadcast(removals), Seq("doc_id"), "left_anti")
    val manifest = time("layout_write", rows, "cell-keyed, resumable") {
      val keyed = graft.layout.CellLayout.withCellKeys(
        cleanPages.select("doc_id", "lon", "lat"),
        col("lon"), col("lat"), col("doc_id"))
      val m = graft.layout.CellLayout.write(keyed, outDir, s"pipeline:$rows")
      (m.valuesIterator.map(_.rows).sum, m)
    }

    // 6. pruned read: Paris hot-spot box (worst-case skew cluster)
    val box = (1.0, 47.5, 3.8, 50.2)
    val pruned = time("pruned_read", manifest.valuesIterator.map(_.rows).sum,
      "bucket + fine-cell pruning") {
      val df = graft.layout.CellLayout.read(spark, outDir, Some(box))
        .filter(col("lon") >= box._1 && col("lon") <= box._3 &&
          col("lat") >= box._2 && col("lat") <= box._4)
        .persist()
      (df.count(), df)
    }

    // 7. spatial join of the pruned window against the region polygons
    val prunedRows = stages.last.outRows
    time("spatial_join", prunedRows, "broadcast cells + exact refine") {
      val regions = WebPages.regions(spark, "/root/testdata/sf0.1")
        .select("region_id", "region_geom")
      val joined = graft.ops.SpatialJoin.containsJoin(
        regions, "region_geom",
        pruned.withColumn("geom", graft.functions.st.point(col("lon"), col("lat")))
          .select("doc_id", "geom"),
        "geom")
      (joined.count(), ())
    }

    // 8. resume: a second write is a manifest no-op (nothing recomputed)
    val resumeNoop = time("resume_check", 0, "manifest-gated") {
      val keyed = graft.layout.CellLayout.withCellKeys(
        cleanPages.select("doc_id", "lon", "lat"),
        col("lon"), col("lat"), col("doc_id"))
      val again = graft.layout.CellLayout.write(keyed, outDir, s"pipeline:$rows")
      (0L, again == manifest)
    }

    val totalBytes = manifest.valuesIterator.map(_.bytes).sum
    val totalFiles = manifest.valuesIterator.map(_.files).sum
    val sb = new StringBuilder
    sb ++= "# Composed pipeline at 40M rows (100-TB shape)\n\n"
    sb ++= s"One lineage: geoparse($rows pages) -> quality filter($docRows docs) -> " +
      s"minhash dedup -> embedding near-dup($vecRows vecs) -> anti-join removals -> " +
      "cell-layout write -> pruned hot-box read -> spatial join -> resume no-op.\n" +
      s"local[$cpus], shuffle.partitions=$cpus.\n\n"
    sb ++= "| stage | input rows | output rows | sec | rows/s | note |\n"
    sb ++= "|---|---|---|---|---|---|\n"
    stages.foreach { s =>
      sb ++= f"| ${s.name} | ${s.inRows}%d | ${s.outRows}%d | ${s.sec}%.1f | ${if (s.inRows > 0) f"${s.rps}%.0f" else "—"} | ${s.note} |\n"
    }
    sb ++= f"\nManifest lineage: ${manifest.size}%d buckets, $totalFiles%d files, " +
      f"${totalBytes / 1e6}%.0f MB, input tag `pipeline:$rows`, per-bucket " +
      "row/byte counts in the manifest. Resume no-op: " + s"$resumeNoop.\n"
    val textFound = stages.find(_.name == "minhash_dedup").map(_.outRows).getOrElse(0L)
    val vecFound = stages.find(_.name == "embedding_ann").map(_.outRows).getOrElse(0L)
    sb ++= f"\nPlanted-duplicate recall: text tier plants a near-duplicate at every " +
      f"17th doc (expected ≈ ${docRows / 17}%d removals; found $textFound%d), vector tier " +
      f"at every 29th (expected ≈ ${vecRows / 29}%d; found $vecFound%d — " +
      f"${100.0 * vecFound / math.max(1, vecRows / 29)}%.2f%%). Survivors written = " +
      "input − removals (exact, asserted by the manifest row total).\n"
    Files.write(Paths.get(report), sb.toString.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    print(sb)
    spark.stop()
  }
}
