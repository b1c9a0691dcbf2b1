package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL-facing registration of the engine's native expressions, so
  * `spark.sql("SELECT dot_product(a, b) ...")` works alongside the Column
  * DSL. Two hookup paths:
  *
  *   - [[GraftExtensions]] via `spark.sql.extensions=graft.functions.GraftExtensions`
  *     (cluster-wide, survives session cloning);
  *   - [[GraftFunctions.register]] on an existing session (tests, REPL).
  */
object GraftFunctions {

  private def longLit(e: Expression, what: String): Long = e match {
    case Literal(v: Long, _) => v
    case Literal(v: Int, _) => v.toLong
    case other => throw new IllegalArgumentException(s"argument $what must be an integer literal, got $other")
  }

  private def boolLit(e: Expression, what: String): Boolean = e match {
    case Literal(v: Boolean, _) => v
    case other => throw new IllegalArgumentException(s"argument $what must be a boolean literal, got $other")
  }

  private def arity(name: String, n: Int)(args: Seq[Expression]): Seq[Expression] = {
    if (args.length != n)
      throw new IllegalArgumentException(
        s"$name expects $n argument(s), got ${args.length}")
    args
  }

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (args: Seq[Expression]) => {
        val Seq(a, b) = arity("dot_product", 2)(args)
        DotProduct(a, b)
      }),
    (
      FunctionIdentifier("poly_hash"),
      new ExpressionInfo(classOf[PolyHash].getName, "poly_hash"),
      (args: Seq[Expression]) => {
        val Seq(s, m, p) = arity("poly_hash", 3)(args)
        PolyHash(s, longLit(m, "mult"), longLit(p, "modulus"))
      }),
    (
      FunctionIdentifier("simhash40"),
      new ExpressionInfo(classOf[SimHash40].getName, "simhash40"),
      (args: Seq[Expression]) => SimHash40(arity("simhash40", 1)(args).head)),
    (
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (args: Seq[Expression]) => {
        val Seq(s, k) = arity("minhash_sig", 2)(args)
        MinHashSig(s, longLit(k, "k").toInt)
      }),
    (
      FunctionIdentifier("shingle_strings"),
      new ExpressionInfo(classOf[ShingleStrings].getName, "shingle_strings"),
      (args: Seq[Expression]) => {
        val Seq(s, d) = arity("shingle_strings", 2)(args)
        ShingleStrings(s, boolLit(d, "distinct"))
      }),
    (
      FunctionIdentifier("shingle_h40s"),
      new ExpressionInfo(classOf[ShingleH40s].getName, "shingle_h40s"),
      (args: Seq[Expression]) => {
        val Seq(s, d) = arity("shingle_h40s", 2)(args)
        ShingleH40s(s, boolLit(d, "distinct"))
      }),
    (
      FunctionIdentifier("token_codes"),
      new ExpressionInfo(classOf[TokenCodes].getName, "token_codes"),
      (args: Seq[Expression]) => TokenCodes(arity("token_codes", 1)(args).head)),
    (
      FunctionIdentifier("dot_longs"),
      new ExpressionInfo(classOf[DotLongs].getName, "dot_longs"),
      (args: Seq[Expression]) => {
        val Seq(a, b) = arity("dot_longs", 2)(args)
        DotLongs(a, b)
      }),
    (
      FunctionIdentifier("micro_ints"),
      new ExpressionInfo(classOf[MicroInts].getName, "micro_ints"),
      (args: Seq[Expression]) => {
        val Seq(a, s) = arity("micro_ints", 2)(args)
        MicroInts(a, longLit(s, "scale"))
      }))

  /** Register on a live session (temp functions). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        ident.funcName,
        builder,
        "built-in")
    }
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.functions.foreach(e.injectFunction)
}
