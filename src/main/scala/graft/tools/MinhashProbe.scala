package graft.tools

import graft.functions.tx
import graft.pages.WebPages
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * One-off diagnosis harness for the minhash near-dup pipeline stages
 * (the BASELINE refresh showed ~6x lower docs/s than the r2 shape; this
 * isolates which stage pays). Not part of the public API.
 *
 * Run: `sbt "runMain graft.tools.MinhashProbe [docs] [cores]"`.
 */
object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val docs = args.headOption.map(_.toLong).getOrElse(1000000L)
    val cores = args.lift(1).map(_.toInt).getOrElse(8)
    // under spark-submit (e.g. --master local-cluster[4,2,6144]) keep the
    // launcher's master/partitions so the probe can diagnose process-
    // isolated executor topologies too; standalone runs use local[cores]
    val base = SparkSession.builder()
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    val spark = (if (sys.props.contains("spark.master")) base
      else base.master(s"local[$cores]")
        .config("spark.sql.shuffle.partitions", cores))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val stagesOnly = sys.env.contains("MINHASH_STAGES")
    def time(name: String)(body: => Long): Unit = {
      if (stagesOnly) return
      val secs = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); val n = body
        val s = (System.nanoTime() - t0) / 1e9
        (s, n)
      }
      println(f"PROBE $name%-28s best=${secs.map(_._1).min}%8.2fs rows=${secs.head._2}")
    }

    // MINHASH_PARQUET=<sfDir>: probe the real fixture table instead of the
    // synthetic generator (the small-file single-partition regime)
    val df = sys.env.get("MINHASH_PARQUET") match {
      case Some(dir) => spark.read.parquet(s"$dir/documents.parquet")
      case None => WebPages.syntheticDocs(spark, docs, partitions = 128)
    }

    // stage 0: signature computation alone (CPU floor)
    time("signatures_only") {
      df.select(tx.minhash(col("text"), lit(32), lit(3)).as("s"))
        .select(element_at(col("s"), 1).as("h1")).agg(avg(col("h1").cast("double"))).collect()
      docs
    }

    // stage 1: current full pipeline
    time("current_minhashPairs") {
      graft.ops.Dedup.minhashPairs(df, "text", "doc_id").count()
    }

    // stage 2: rep collapse via groupBy(__h).agg(first(sig)) — the shuffle
    time("rep_collapse_groupby") {
      val h = unhex(md5(col("text").cast("binary")))
      df.select(col("doc_id").as("id"), h.as("__h"),
          tx.minhash(col("text"), lit(32), lit(3)).as("__sig"))
        .groupBy("__h").agg(min(col("id")).as("rid"), first(col("__sig")).as("__sig"))
        .count()
    }

    // stage 3: band explode + WINDOW bucket guard + self-join (no collapse)
    time("window_guard_join") {
      import org.apache.spark.sql.expressions.Window
      val bands = df.select(col("doc_id").as("rid"),
          explode(tx.lshBands(tx.minhash(col("text"), lit(32), lit(3)), lit(4))).as("band"))
      val guarded = bands
        .withColumn("__bc", count(lit(1)).over(Window.partitionBy("band")))
        .filter(col("__bc") <= 10000L).drop("__bc")
      guarded.as("a").join(guarded.as("b"),
          col("a.band") === col("b.band") && col("a.rid") < col("b.rid"))
        .count()
    }

    // stage 4: band explode + AGG-count guard (r2 shape: groupBy pre-pass)
    time("aggcount_guard_join") {
      val bands = df.select(col("doc_id").as("rid"),
          explode(tx.lshBands(tx.minhash(col("text"), lit(32), lit(3)), lit(4))).as("band"))
        .persist()
      val big = bands.groupBy("band").count().filter(col("count") > 10000L)
        .select(col("band"))
      val guarded = bands.join(big, Seq("band"), "left_anti")
      val n = guarded.as("a").join(guarded.as("b"),
          col("a.band") === col("b.band") && col("a.rid") < col("b.rid"))
        .count()
      bands.unpersist()
      n
    }

    // stage 5: the full candidate path of minhashPairs (collapse + window
    // guard + self-join + dropDuplicates) but stopping BEFORE the text
    // re-join / jaccard verify / group expansion
    time("collapsed_candidates") {
      import org.apache.spark.sql.expressions.Window
      val h = unhex(md5(col("text").cast("binary")))
      val sig = df.select(col("doc_id").as("id"), h.as("__h"),
          tx.minhash(col("text"), lit(32), lit(3)).as("__sig"))
        .filter(element_at(col("__sig"), 1) =!= lit(Long.MaxValue))
      val reps = sig.groupBy("__h").agg(min(col("id")).as("rid"), first(col("__sig")).as("__sig"))
      val bands = reps.select(col("rid"), col("__h"),
        explode(tx.lshBands(col("__sig"), lit(4))).as("band"))
      val guarded = bands
        .withColumn("__bc", count(lit(1)).over(Window.partitionBy("band")))
        .filter(col("__bc") <= 10000L).drop("__bc")
      guarded.as("a").join(guarded.as("b"),
          col("a.band") === col("b.band") && col("a.rid") < col("b.rid"))
        .select(col("a.rid").as("rid_a"), col("b.rid").as("rid_b"))
        .dropDuplicates("rid_a", "rid_b")
        .count()
    }

    // stage 6: jaccard verify alone over a self-paired sample (per-pair
    // shingling cost, no join machinery)
    time("jaccard_100k_pairs") {
      val t = df.limit(100000).select(col("text").as("ta"), col("text").as("tb"))
      t.select(tx.ngramJaccard(col("ta"), col("tb"), lit(3)).as("j"))
        .agg(avg("j")).collect()
      100000L
    }

    // stage 7: candidates + text re-join + jaccard verify (no expansion)
    def candFrame(): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val h = unhex(md5(col("text").cast("binary")))
      val banded = df.select(col("doc_id").as("id"), h.as("__h"),
          tx.minhash(col("text"), lit(32), lit(3)).as("__sig"))
        .filter(element_at(col("__sig"), 1) =!= lit(Long.MaxValue))
        .select(col("id"), col("__h"), tx.lshBands(col("__sig"), lit(4)).as("__bands"))
      val reps = banded.groupBy("__h").agg(min(col("id")).as("rid"),
        first(col("__bands")).as("__bands"))
      val bands = reps.select(col("rid"), col("__h"), explode(col("__bands")).as("band"))
      val guarded = bands
        .withColumn("__bc", count(lit(1)).over(Window.partitionBy("band")))
        .filter(col("__bc") <= 10000L).drop("__bc")
      guarded.as("a").join(guarded.as("b"),
          col("a.band") === col("b.band") && col("a.rid") < col("b.rid"))
        .select(col("a.rid").as("rid_a"), col("b.rid").as("rid_b"))
        .dropDuplicates("rid_a", "rid_b")
    }
    val texts = df.select(col("doc_id").as("__tid"), col("text").as("__text"))
    time("verify_tail_smj") {
      candFrame()
        .join(texts, col("rid_a") === col("__tid")).withColumnRenamed("__text", "text_a").drop("__tid")
        .join(texts, col("rid_b") === col("__tid")).withColumnRenamed("__text", "text_b").drop("__tid")
        .withColumn("jaccard", tx.ngramJaccard(col("text_a"), col("text_b"), lit(3)))
        .filter(col("jaccard") >= 0.6).count()
    }
    time("verify_tail_bcast") {
      val c = candFrame()
      broadcast(c)
        .join(texts, col("rid_a") === col("__tid")).withColumnRenamed("__text", "text_a").drop("__tid")
        .join(texts, col("rid_b") === col("__tid")).withColumnRenamed("__text", "text_b").drop("__tid")
        .withColumn("jaccard", tx.ngramJaccard(col("text_a"), col("text_b"), lit(3)))
        .filter(col("jaccard") >= 0.6).count()
    }

    if (sys.env.contains("MINHASH_STAGES")) {
      import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
      val stages = scala.collection.mutable.ArrayBuffer[(Int, String, Long, Long, Int)]()
      val l = new SparkListener {
        override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          stages += ((si.stageId, si.name.takeWhile(_ != '\n').take(80),
            si.taskMetrics.executorRunTime, si.taskMetrics.executorCpuTime / 1000000,
            si.numTasks))
        }
      }
      // warm-up run first so the listener sees steady-state stage times
      graft.ops.Dedup.minhashPairs(df, "text", "doc_id").count()
      spark.sparkContext.addSparkListener(l)
      val t0 = System.nanoTime()
      val n = graft.ops.Dedup.minhashPairs(df, "text", "doc_id").count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(2000)
      spark.sparkContext.removeSparkListener(l)
      println(f"STAGES wall=$wall%.2f rows=$n")
      stages.sortBy(-_._3).take(25).foreach { case (id, name, run, cpu, tasks) =>
        println(f"STAGE $id%4d run=${run / 1000.0}%8.2fs cpu=${cpu / 1000.0}%8.2fs tasks=$tasks%4d  $name")
      }
    }

    if (sys.env.contains("MINHASH_EXPLAIN")) {
      val full = graft.ops.Dedup.minhashPairs(df, "text", "doc_id")
      java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/minhash_full_plan.txt"),
        full.queryExecution.executedPlan.toString)
      full.count() // materialize so AQE finalizes
      java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/minhash_final_plan.txt"),
        full.queryExecution.executedPlan.toString)
    }

    spark.stop()
  }
}
