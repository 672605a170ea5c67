package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

/** Salting must never change results — only partitioning. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  // heavily skewed: 90% of rows share key 0
  private lazy val skewed = Seq.tabulate(2000)(i =>
    (if (i % 10 == 0) i.toLong % 7 else 0L, i.toLong)).toDF("k", "x")
  private lazy val dim = Seq.tabulate(7)(i => (i.toLong, s"name_$i")).toDF("k", "name")

  test("saltedJoin equals the plain inner join") {
    val plain = skewed.join(dim, Seq("k"))
      .select("k", "x", "name").as[(Long, Long, String)].collect().sorted
    val salted = Skew.saltedJoin(skewed, dim, Seq("k"), salts = 8)
      .select("k", "x", "name").as[(Long, Long, String)].collect().sorted
    assert(salted.toSeq == plain.toSeq)
  }

  test("saltedAggregate equals the plain groupBy sum/count") {
    val plain = skewed.groupBy("k")
      .agg(sum("x").as("sum_x"), count(lit(1)).as("n"))
      .as[(Long, Long, Long)].collect().sorted
    val salted = Skew.saltedAggregate(skewed, Seq("k"), "x", salts = 8)
      .as[(Long, Long, Long)].collect().sorted
    assert(salted.toSeq == plain.toSeq)
  }

  test("salted join spreads a hot key over multiple salt values") {
    val salts = Seq.tabulate(2000)(i => (0L, i.toLong)).toDF("k", "x")
      .withColumn("__salt", pmod(xxhash64(col("x")), lit(8)))
      .select("__salt").distinct().count()
    assert(salts > 4) // content hash actually scatters
  }
}
