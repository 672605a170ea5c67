package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Per-batch action/job attribution for the streaming sinks' foldBatch
  * paths (ManifestStream + ClusterStream) — the streaming twin of
  * [[Prof]] (guide §1). Replays the capstone fixture as two batches
  * (batch 0 = bootstrap-as-inserts, batch 1 = the change batch) against
  * fresh temp roots and prints each batch's Spark job count, summed job
  * wall, and the per-job description/wall table, so redundant
  * materializations inside a fold are attributable without the UI.
  *
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.StreamProf <sfDir>"
  *
  * Diagnostic only — never run by the driver. */
object StreamProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class JobRow(id: Int, desc: String, start: Long, var end: Long = 0L)
    val jobs = mutable.LinkedHashMap.empty[Int, JobRow]
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        jobs.synchronized { jobs(js.jobId) = JobRow(js.jobId, desc, js.time) }
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        jobs.synchronized { jobs.get(je.jobId).foreach(_.end = je.time) }
    }

    def profiled(label: String)(body: => Unit): Unit = {
      jobs.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      body
      val wall = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      Thread.sleep(300)
      val walls = jobs.values.map(j =>
        if (j.end > 0) j.end - j.start else 0L).sum
      println(f"%n=== $label: wall $wall%.3f s, ${jobs.size} jobs, " +
        f"job-wall sum ${walls / 1000.0}%.3f s ===")
      jobs.values.toSeq.sortBy(j => -(j.end - j.start)).take(40)
        .foreach { j =>
          println(f"${j.id}%5d ${if (j.end > 0) j.end - j.start else -1L}%7d ms  ${j.desc.take(70)}")
        }
    }

    def rmTree(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rmTree))
      f.delete(); ()
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val (boot, feed) = PipelineQueries.manifestStreamFeed(docs)
    def battery(df: DataFrame): DataFrame =
      operators.TextAnalysis.filterBattery(df, idCol = "id",
        minTokens = 30, maxTokens = 100000, minAvgLen = 3.0,
        maxAvgLen = 10.0, minAlphaRatio = 0.8, minStopwordHits = 2,
        minDistinctRatio = 0.3)
    val splits = Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)

    // ---- ManifestStream ----
    locally {
      val root = java.nio.file.Files.createTempDirectory("sp_mf").toString
      // warmup replay on a scratch root (JIT + page cache)
      val warm = java.nio.file.Files.createTempDirectory("sp_mfw").toString
      streaming.ManifestStream.foldBatch(boot, 0L, warm, battery, lit(0.0), splits)
      streaming.ManifestStream.foldBatch(feed, 1L, warm, battery, lit(0.0), splits)
      rmTree(new java.io.File(warm))
      profiled("ManifestStream batch 0 (bootstrap-as-inserts)") {
        streaming.ManifestStream.foldBatch(boot, 0L, root, battery, lit(0.0), splits)
      }
      profiled("ManifestStream batch 1 (change batch)") {
        streaming.ManifestStream.foldBatch(feed, 1L, root, battery, lit(0.0), splits)
      }
      rmTree(new java.io.File(root))
    }

    // ---- ClusterStream ----
    locally {
      val b0 = boot.select(col("seq"), col("op"), col("id"), col("text"))
      val b1 = feed.select(col("seq"), col("op"), col("id"), col("text"))
      val root = java.nio.file.Files.createTempDirectory("sp_cl").toString
      val warm = java.nio.file.Files.createTempDirectory("sp_clw").toString
      streaming.ClusterStream.foldBatch(b0, 0L, warm)
      streaming.ClusterStream.foldBatch(b1, 1L, warm)
      rmTree(new java.io.File(warm))
      profiled("ClusterStream batch 0 (bootstrap-as-inserts)") {
        streaming.ClusterStream.foldBatch(b0, 0L, root)
      }
      profiled("ClusterStream batch 1 (change batch)") {
        streaming.ClusterStream.foldBatch(b1, 1L, root)
      }
      rmTree(new java.io.File(root))
    }
    spark.stop()
  }
}
