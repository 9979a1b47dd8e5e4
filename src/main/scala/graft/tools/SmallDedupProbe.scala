package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** One-off: where does the SMALL-corpus (sf0.1, 5000 docs) dedup latency
  * go — per-stage wall, task time and task counts for one minhash run. */
object SmallDedupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.read.parquet(s"$sfDir/documents.parquet")

    // warm codegen/session
    graft.ops.Dedup.minhashPairs(df, "text", "doc_id").count()
    spark.sharedState.cacheManager.clearCache()

    case class S(id: Int, name: String, wallMs: Long, taskMs: Long, tasks: Int,
                 submitted: Long, completed: Long)
    val stages = scala.collection.mutable.ArrayBuffer[S]()
    val l = new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        stages += S(i.stageId, i.name.takeWhile(_ != '\n').take(70),
          i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L),
          i.taskMetrics.executorRunTime, i.numTasks,
          i.submissionTime.getOrElse(0L), i.completionTime.getOrElse(0L))
      }
    }
    spark.sparkContext.addSparkListener(l)
    val t0 = System.nanoTime()
    val n = graft.ops.Dedup.minhashPairs(df, "text", "doc_id").count()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(800)
    spark.sparkContext.removeSparkListener(l)
    println(f"MINHASH wall=$wall%.2f rows=$n stages=${stages.size}")
    val base = stages.map(_.submitted).min
    stages.sortBy(_.submitted).foreach { s =>
      println(f"STG ${s.id}%3d  t+${(s.submitted - base) / 1000.0}%5.2f..${(s.completed - base) / 1000.0}%5.2f  wall=${s.wallMs / 1000.0}%5.2f taskSum=${s.taskMs / 1000.0}%6.2f tasks=${s.tasks}%3d  ${s.name}")
    }
    spark.stop()
  }
}
