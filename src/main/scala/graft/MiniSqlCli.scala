package graft

import org.apache.spark.sql.SparkSession

import graft.engine.{AsciiTable, MiniSqlEngine}
import graft.engine.MiniSql.MiniSqlError
import graft.sources.CsvCatalog

/** The reference's two entry points (/root/reference/sqlengine.py:
  * 731-751), Spark-backed:
  *  - one-shot:  runMain graft.MiniSqlCli <dataDir> "<query>"
  *  - REPL:      runMain graft.MiniSqlCli <dataDir>      (SqlEngine> …)
  */
object MiniSqlCli {
  def main(args: Array[String]): Unit = {
    val dataDir = args.headOption.getOrElse(".")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("minisql")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val engine = new MiniSqlEngine(CsvCatalog.load(spark, dataDir))

    def runOne(q: String): Unit =
      try AsciiTable.show(engine.execute(q))
      catch {
        case MiniSqlError(msg) => println(msg)
        case e: Exception => println(s"Oops, error - please retry (${e.getMessage})")
      }

    if (args.length > 1) runOne(args(1))
    else {
      Iterator.continually { print("SqlEngine> "); Console.flush(); scala.io.StdIn.readLine() }
        .takeWhile(l => l != null && l.trim != "quit" && l.trim != "q")
        .filter(_.trim.nonEmpty)
        .foreach(runOne)
    }
    spark.stop()
  }
}
