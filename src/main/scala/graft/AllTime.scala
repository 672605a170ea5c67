package graft
import org.apache.spark.sql.SparkSession

/** Times EVERY registered query (not just the bench headliners) against
  * a scale dir — the sweep that catches operators whose cost curve bends
  * at 10× data. Usage:
  *   sbt "runMain graft.AllTime [sfDir] [queryName...]"
  */
object AllTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val only = args.drop(1).toSet
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.all.filter(q => only.isEmpty || only(q.name)).foreach { q =>
      val t0 = System.nanoTime()
      try {
        q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"ALLTIME ${q.name}%-24s ${(System.nanoTime()-t0)/1e9}%8.2f s")
      } catch { case e: Throwable =>
        println(f"ALLTIME ${q.name}%-24s FAILED ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
