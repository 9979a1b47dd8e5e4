package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

import graft.pages.WebPages
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/**
 * 100-TB dress rehearsal of the CellLayout read path at bench scale: write
 * the layout at the production bucket resolution over the 40M-row page
 * generator, then run the query-box read and record what the scan ACTUALLY
 * touched (post-partition-pruning file count/bytes from the parquet scan
 * node's metrics, materialized rows from the task input metrics) against
 * the same query executed as a full-table scan + filter. The fine-cell
 * `BETWEEN` ranges derived at SortRes are asserted on a small fixture in
 * CellLayoutSpec; this main produces the same evidence at 40M+ rows
 * (VERDICT r3 task 8).
 *
 *   sbt "runMain graft.tools.LayoutRehearsal 40000000 /tmp/graft_layout40m 6"
 */
object LayoutRehearsal {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(40000000L)
    val outDir = args.lift(1).getOrElse("/tmp/graft_layout40m")
    val bucketRes = args.lift(2).map(_.toInt).getOrElse(6)
    val report = args.lift(3).getOrElse("BENCH/LAYOUT40M.md")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

    // heap: spark.driver.memory set in-process is a no-op in local mode —
    // size the forked JVM via SPARK_DRIVER_MEM (build.sbt turns it into -Xmx)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ---- write once (resumable: a prior manifest skips completed waves) ----
    val keyed = graft.layout.CellLayout.withCellKeys(
      WebPages.syntheticPages(spark, rows, partitions = 128)
        .select("doc_id", "lon", "lat"),
      col("lon"), col("lat"), col("doc_id"), bucketRes = bucketRes)
    val t0 = System.nanoTime()
    val manifest = graft.layout.CellLayout.write(keyed, outDir, s"synthetic:$rows")
    val writeSec = (System.nanoTime() - t0) / 1e9
    val totalBytes = manifest.valuesIterator.map(_.bytes).sum
    val totalFiles = manifest.valuesIterator.map(_.files).sum

    // Paris hot-spot box (one of the three 2°x2° skew clusters) — the
    // worst-case hot read — plus a cold mid-ocean box
    val boxes = Seq(
      "hot_paris" -> (1.0, 47.5, 3.8, 50.2),
      "cold_ocean" -> (-45.0, -45.0, -40.0, -40.0))

    case class Scan(label: String, files: Long, bytes: Long, readMB: Double,
                    rowsOut: Long, sec: Double)
    def runScan(label: String, df: org.apache.spark.sql.DataFrame,
                x0: Double, y0: Double, x1: Double, y1: Double): Scan = {
      // exact refine on top of whichever pruning the source provides
      val q = df.filter(col("lon") >= x0 && col("lon") <= x1 &&
        col("lat") >= y0 && col("lat") <= y1)
      // execute THIS QueryExecution (df.count() would build a new one and
      // leave the scan node's metrics unpopulated) and accumulate the task
      // input metrics — bytes actually read shows row-group pruning inside
      // surviving files, which the listing-time filesSize metric cannot
      import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
      val bytesRead = new java.util.concurrent.atomic.AtomicLong(0L)
      val listener = new SparkListener {
        override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
          if (e.taskMetrics != null)
            bytesRead.addAndGet(e.taskMetrics.inputMetrics.bytesRead): Unit
      }
      spark.sparkContext.addSparkListener(listener)
      val qe = q.queryExecution
      val t = System.nanoTime()
      val n = qe.toRdd.count()
      val sec = (System.nanoTime() - t) / 1e9
      Thread.sleep(500) // drain the listener bus (private API) before reading
      spark.sparkContext.removeSparkListener(listener)
      // post-execution: the scan node's metrics hold the post-partition-
      // pruning file count and size (AQE wraps the plan; unwrap to find it)
      def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
        p match {
          case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
          case f: FileSourceScanExec => Seq(f)
          case other => other.children.flatMap(scans)
        }
      val ss = scans(qe.executedPlan)
      val files = ss.map(s => s.metrics.get("numFiles").map(_.value).getOrElse(0L)).sum
      val bytes = ss.map(s => s.metrics.get("filesSize").map(_.value).getOrElse(0L)).sum
      Scan(label, files, bytes, bytesRead.get / 1e6, n, sec)
    }

    val lines = new StringBuilder
    lines ++= "# 40M-row CellLayout dress rehearsal\n\n"
    lines ++= f"Write: $rows%d rows at bucketRes=$bucketRes → ${manifest.size}%d buckets, " +
      f"$totalFiles%d files, ${totalBytes / 1e6}%.0f MB in $writeSec%.1f s " +
      f"(${rows / writeSec}%.0f rows/s).\n\n"
    lines ++= "| query box | path | files listed | MB listed | MB read | rows out | sec |\n"
    lines ++= "|---|---|---|---|---|---|---|\n"
    boxes.foreach { case (label, (x0, y0, x1, y1)) =>
      // pruned: bucket partition pruning + fine-cell BETWEEN ranges
      val pruned = runScan(s"$label pruned",
        graft.layout.CellLayout.read(spark, outDir, queryBox = Some((x0, y0, x1, y1))),
        x0, y0, x1, y1)
      // full: same parquet, no query box (partition + row-group stats idle)
      val full = runScan(s"$label full",
        spark.read.parquet(outDir).withColumn("bucket", col("bucket").cast("long")),
        x0, y0, x1, y1)
      require(pruned.rowsOut == full.rowsOut,
        s"pruned/full row mismatch for $label: ${pruned.rowsOut} vs ${full.rowsOut}")
      Seq(pruned, full).foreach { s =>
        lines ++= f"| $label | ${s.label.split(' ').last} | ${s.files}%d | ${s.bytes / 1e6}%.1f | ${s.readMB}%.1f | ${s.rowsOut}%d | ${s.sec}%.2f |\n"
      }
    }
    lines ++= "\nRow counts match between pruned and full paths (asserted). " +
      "`files/MB listed` are the parquet scan node's post-partition-pruning " +
      "listing metrics (bucket-dir pruning); `MB read` is the summed task " +
      "input bytes — the additional gap vs `MB listed` is row-group " +
      "min/max pruning on the sorted fine-cell key inside surviving files.\n"
    Files.write(Paths.get(report), lines.toString.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    print(lines)
    spark.stop()
  }
}
