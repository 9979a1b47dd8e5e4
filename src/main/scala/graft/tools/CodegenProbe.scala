package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off: small-corpus dedup latency variants (sf0.1, 5000 × ~300 B
  * docs). History: the codegen hypothesis was DISPROVED here (2 compiles
  * during a measured run — the warm cache hits); the real cost was
  * stage/task dispatch — 32-task stages × ~10 stages. The fix (explicit
  * smallParts exchanges keyed so every group-by/window/join reuses them)
  * lives in Dedup.scala; this probe re-measures the variants. */
object CodegenProbe {
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

    def time(label: String, reps: Int = 3)(body: => Long): Unit = {
      val walls = (1 to reps).map { _ =>
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime(); val n = body
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"$label%-34s best=${walls.map(_._1).min}%.2fs rows=${walls.head._2}")
    }

    graft.ops.Dedup.minhashPairs(df, "text", "doc_id").count() // warm
    graft.ops.Dedup.simhashPairs(df, "text", "doc_id").count()

    time("minhash (default smallParts=8)") {
      graft.ops.Dedup.minhashPairs(df, "text", "doc_id").count()
    }
    time("minhash smallParts=32") {
      spark.conf.set("spark.graft.dedup.smallParts", "32")
      try graft.ops.Dedup.minhashPairs(df, "text", "doc_id").count()
      finally spark.conf.unset("spark.graft.dedup.smallParts")
    }
    time("minhash smallParts=4") {
      spark.conf.set("spark.graft.dedup.smallParts", "4")
      try graft.ops.Dedup.minhashPairs(df, "text", "doc_id").count()
      finally spark.conf.unset("spark.graft.dedup.smallParts")
    }
    time("simhash (default smallParts=8)") {
      graft.ops.Dedup.simhashPairs(df, "text", "doc_id").count()
    }
    spark.stop()
  }
}
