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

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))),
    (
      FunctionIdentifier("poly_hash"),
      new ExpressionInfo(classOf[PolyHash].getName, "poly_hash"),
      (args: Seq[Expression]) =>
        PolyHash(args(0), longLit(args(1), "mult"), longLit(args(2), "modulus"))),
    (
      FunctionIdentifier("simhash40"),
      new ExpressionInfo(classOf[SimHash40].getName, "simhash40"),
      (args: Seq[Expression]) => SimHash40(args(0))),
    (
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (args: Seq[Expression]) => MinHashSig(args(0), longLit(args(1), "k").toInt)),
    (
      FunctionIdentifier("shingle_strings"),
      new ExpressionInfo(classOf[ShingleStrings].getName, "shingle_strings"),
      (args: Seq[Expression]) => ShingleStrings(args(0), boolLit(args(1), "distinct"))),
    (
      FunctionIdentifier("shingle_h40s"),
      new ExpressionInfo(classOf[ShingleH40s].getName, "shingle_h40s"),
      (args: Seq[Expression]) => ShingleH40s(args(0), boolLit(args(1), "distinct"))),
    (
      FunctionIdentifier("token_codes"),
      new ExpressionInfo(classOf[TokenCodes].getName, "token_codes"),
      (args: Seq[Expression]) => TokenCodes(args(0))))

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
