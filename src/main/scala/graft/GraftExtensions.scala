package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{ArrayDotProduct, MisraGriesAggregate, TopKAggregate}

/** Session extensions registering graft's native expressions for SQL
  * use — activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`:
  *
  * {{{
  *   spark.sql("SELECT graft_dot(embedding, embedding) FROM embeddings")
  * }}}
  *
  * DataFrame-API callers don't need this — [[graft.functions.VectorOps]]
  * builds the expressions directly.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {
  private def info(name: String, clazz: Class[_]) =
    new ExpressionInfo(clazz.getName, name)

  /** Wrong-arity SQL calls must surface as a function-signature error
    * naming the expected shape, not a raw IndexOutOfBoundsException
    * from `args(i)` inside the builder. */
  private def arity(name: String, signature: String, n: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    args => {
      if (args.length != n) throw new IllegalArgumentException(
        s"$name expects $n arguments: $name($signature); got ${args.length}")
      build(args)
    }

  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_dot", info("graft_dot", classOf[ArrayDotProduct]),
      arity("graft_dot", "vec_a, vec_b", 2)(
        args => ArrayDotProduct(args.head, args(1)))),
    // graft_top_k(score, tiebreak, payload, k) — k must be an int literal
    ("graft_top_k", info("graft_top_k", classOf[TopKAggregate]),
      arity("graft_top_k", "score, tiebreak, payload, k-int-literal", 4)(
        args => TopKAggregate(args.head, args(1), args(2),
          args(3) match {
            case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
            case other => throw new IllegalArgumentException(
              s"graft_top_k: k must be an integer literal, got $other")
          }))),
    // graft_heavy_hitters(key, k) — Misra–Gries candidate summary;
    // k must be an int literal (it sizes the bounded state)
    ("graft_heavy_hitters", info("graft_heavy_hitters", classOf[MisraGriesAggregate]),
      arity("graft_heavy_hitters", "key, k-int-literal", 2)(
        args => MisraGriesAggregate(args.head,
          args(1) match {
            case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
            case other => throw new IllegalArgumentException(
              s"graft_heavy_hitters: k must be an integer literal, got $other")
          }))))

  /** Late registration into an already-built session (e.g. one handed
    * to us by a host process that didn't set spark.sql.extensions). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (name, i, b) =>
      org.apache.spark.sql.GraftBridge.registerFunction(spark, name, i, b)
    }
}
