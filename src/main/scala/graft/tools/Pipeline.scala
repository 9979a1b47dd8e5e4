package graft.tools

import graft.layout.CellLayout
import graft.ops.SpatialJoin
import graft.pages.WebPages
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * End-to-end pipeline demonstration (north rule shape): geoparse →
 * cell-keyed checkpointed write (with manifest lineage/metrics) → pruned
 * read → spatial join on the pruned table. Prints per-stage metrics.
 *
 * Run: `sbt "runMain graft.tools.Pipeline [sfDir] [outDir]"`.
 */
object Pipeline {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outDir = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("graft_pipeline").toString)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.install(spark)

    // stage 1: geoparse (pure projection — text byte-identical)
    val pages = WebPages.pages(spark, sfDir)
      .select("doc_id", "url", "text", "lang", "lon", "lat", "sec")

    // stage 1b: training-data filters — quality score + language ID
    // (codegen'd expressions, narrow, no shuffle)
    import graft.functions.tx
    val scored = pages
      .withColumn("quality", tx.qualityScore(col("text")))
      .withColumn("lang_pred", tx.langGuess(col("text")))
      .filter(col("quality") > 0.3)
    println(s"PIPELINE_QUALITY_KEPT=${scored.count()} (of ${pages.count()})")

    // stage 1c: near-duplicate removal — MinHash+LSH candidates, exact
    // Jaccard verify, connected-component survivors
    val deduped = graft.ops.Dedup.nearDupSurvivors(
      scored, "doc_id",
      graft.ops.Dedup.minhashPairs(scored, "text", "doc_id"), "id_a", "id_b")
    println(s"PIPELINE_DEDUP_SURVIVORS=${deduped.count()}")

    // stage 1d: media near-dup — REAL decoded luma-histogram vectors ride
    // the SAME LSH bucket machinery as text dedup (Multimodal →
    // Similarity.nearDupPairs); fixture: 150 distinct synthetic PNGs + 50
    // lightly-edited copies planted as near-duplicates
    val media = {
      import java.awt.image.BufferedImage
      def png(seed: Int, w: Int, h: Int, threshDelta: Int = 0): Array[Byte] = {
        val dark = 8 * (seed % 12) + 4; val bright = 255 - 8 * (seed % 9) - 4
        val thresh = 20 + (seed * 7) % 60 + threshDelta
        val im = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        (0 until h).foreach(y => (0 until w).foreach { x =>
          val v = if ((x * 31 + y * 17 + seed * 13) % 97 < thresh) dark else bright
          im.setRGB(x, y, (v << 16) | (v << 8) | v)
        })
        val buf = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(im, "png", buf); buf.toByteArray
      }
      import spark.implicits._
      ((0 until 150).map(s => (s.toLong, png(s, 48, 48))) ++
        (0 until 50).map(s => (1000L + s, png(s, 48, 48, threshDelta = 2))))
        .toDF("media_id", "payload").repartition(8)
    }
    val mediaPairs = graft.ops.Multimodal.imageNearDupPairs(media, "payload", "media_id")
    println(s"PIPELINE_MEDIA_NEAR_DUPS=${mediaPairs.count()} (50 planted)")

    // stage 2: cell-keyed checkpointed write (resumable; manifest metrics)
    val keyed = CellLayout.withCellKeys(deduped, col("lon"), col("lat"), col("doc_id"))
    val manifest = CellLayout.write(keyed, outDir, inputPath = sfDir)
    println(s"PIPELINE_BUCKETS=${manifest.size}")
    println(s"PIPELINE_ROWS=${CellLayout.countEstimate(outDir)}")
    println(s"PIPELINE_BYTES=${manifest.values.map(_.bytes).sum}")

    // stage 3: pruned read — only buckets covering the query window
    val window = (-180.0, -85.0, 0.0, 85.0) // western hemisphere
    val pruned = CellLayout.read(spark, outDir, Some(window))
    println(s"PIPELINE_PRUNED_ROWS=${pruned.count()} (of ${CellLayout.countEstimate(outDir)})")

    // stage 4: spatial join over the pruned cell table
    val regions = WebPages.regions(spark, sfDir).select("region_id", "region_geom")
    val joined = SpatialJoin.containsJoin(
      regions, "region_geom",
      pruned.withColumn("geom", graft.functions.st.point(col("lon"), col("lat")))
        .select("doc_id", "geom"),
      "geom")
    println(s"PIPELINE_JOIN_PAIRS=${joined.count()}")

    // resume proof: a second write invocation is a no-op
    val again = CellLayout.write(keyed, outDir, inputPath = sfDir)
    println(s"PIPELINE_RESUME_NOOP=${again == manifest}")
    spark.stop()
  }
}
