package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** Pins the native codegen'd dot product against the higher-order-
  * function reference implementation (must be bit-identical — same
  * left-to-right fold) and its SQL registration. */
class ArrayDotProductSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = {
    val rnd = new scala.util.Random(11)
    Seq.tabulate(200)(i =>
      (i.toLong, Array.fill(64)(rnd.nextGaussian()), Array.fill(64)(rnd.nextGaussian())))
      .toDF("id", "a", "b")
  }

  test("dotNative is bit-identical to the HOF dot") {
    val diff = vecs
      .select(VectorOps.dot(col("a"), col("b")).as("hof"),
        VectorOps.dotNative(col("a"), col("b")).as("native"))
      .filter(col("hof") =!= col("native"))
    assert(diff.count() === 0)
  }

  test("dotNative handles float arrays via implicit cast and null inputs") {
    val df = Seq(
      (Some(Array(1.0f, 2.0f)), Some(Array(3.0f, 4.0f))),
      (None, Some(Array(1.0f)))).toDF("a", "b")
    val out = df.select(VectorOps.dotNative(col("a"), col("b")).as("d"))
      .as[Option[Double]].collect()
    assert(out(0).contains(11.0))
    assert(out(1).isEmpty) // null array → null result
  }

  test("graft_dot is SQL-callable after registration and matches HOF dot") {
    GraftExtensions.register(spark)
    vecs.createOrReplaceTempView("__vecs")
    val viaSql = spark.sql(
      "SELECT id, graft_dot(CAST(a AS ARRAY<DOUBLE>), CAST(b AS ARRAY<DOUBLE>)) AS d FROM __vecs")
    val viaHof = vecs.select(col("id"), VectorOps.dot(col("a"), col("b")).as("hof"))
    assert(viaSql.join(viaHof, "id").filter(col("d") =!= col("hof")).count() === 0)
  }

  test("cosine of a vector with itself is 1.0") {
    val ones = vecs.select(VectorOps.cosine(col("a"), col("a")).as("c"))
      .filter(abs(col("c") - 1.0) > 1e-12)
    assert(ones.count() === 0)
  }
}
