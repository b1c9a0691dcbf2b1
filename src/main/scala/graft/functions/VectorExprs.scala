package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Sequential-order dot product of two double arrays as a native Catalyst
  * expression with whole-stage codegen.
  *
  * Semantics are EXACTLY the interpreted fold it replaces
  * (`aggregate(zip_with(a, b, _*_), 0.0, _+_)` — [[Parity.dotSql]]):
  * element-by-element left-to-right accumulation over min(len(a), len(b)),
  * so IEEE results stay bit-identical with the DuckDB oracle. The
  * higher-order-function form runs interpreted (no codegen for lambda
  * expressions) and costs ~50× more per element; on a 100 TB embedding
  * corpus the vector kernel is the hot loop, which is why this is a real
  * `Expression` with `doGenCode` and not a UDF (no serialization, no
  * boxing, stays inside the generated stage).
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dot_product expects two array<double> arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object DotProduct {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** Sequential-order dot product of two LONG arrays, accumulated in
  * doubles — exactly `DotProduct(a.cast(array<double>),
  * b.cast(array<double>))` (each long converts exactly: micro-unit
  * values stay far below 2^53) but WITHOUT materializing two cast
  * copies per evaluation. This is the k-means / PQ assignment hot loop:
  * cellScore runs once per (vector, candidate-cell) pair, so the cast
  * allocations dominated the scan's garbage at corpus scale.
  */
case class DotLongs(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(org.apache.spark.sql.types.LongType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dot_longs expects two array<bigint> arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "dot_longs"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getLong(i).toDouble * y.getLong(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getLong($i) * (double) $b.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object DotLongs {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(DotLongs(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** Micro-unit fixed-pointing of a double array:
  * `transform(e, x -> CAST(round(x * scale) AS BIGINT))` as a native
  * codegen'd expression. Semantics are EXACTLY the interpreted
  * higher-order form it replaces — including Spark `round`'s
  * decimal-string HALF_UP rounding (BigDecimal.valueOf, not
  * Math.round, whose half-toward-positive differs on negative .5s) —
  * so existing oracles stay bit-identical. Null elements yield null,
  * as the lambda form did.
  *
  * This is the first map of every k-means / IVF / PQ query (it runs
  * once per corpus vector); as an interpreted lambda it not only costs
  * ~50× per element but pollutes the shared megamorphic
  * `Expression.eval` JIT profile for every later query in the session
  * (the ShingleKernel lesson) — measured as the ANN family inflating
  * 5× in long-lived bench JVMs while staying ~4 s standalone.
  */
case class MicroInts(child: Expression, scale: Long)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"micro_ints expects array<double>, got ${t.simpleString}")
    }

  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType)

  override def prettyName: String = "micro_ints"

  override def nullSafeEval(v: Any): Any = MicroInts.convert(v.asInstanceOf[ArrayData], scale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MicroInts.convert($c, ${scale}L)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MicroInts {

  /** Spark Round(double, 0) semantics: BigDecimal.valueOf (shortest
    * decimal repr) + HALF_UP — NOT Math.round. Shared by interpreted
    * and generated paths.
    */
  def round0(x: Double): Long =
    java.math.BigDecimal.valueOf(x).setScale(0, java.math.RoundingMode.HALF_UP).longValue()

  def convert(a: ArrayData, scale: Long): ArrayData = {
    val n = a.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) out(i) = round0(a.getDouble(i) * scale)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def apply(c: Column, scale: Long): Column =
    ColumnBridge.column(MicroInts(ColumnBridge.expression(c), scale))
}

/** Polynomial rolling hash over a string's Unicode code points:
  * `fold(codepoints(s), 0, acc -> (acc * mult + cp) % p)` — the codegen'd
  * form of [[Parity.charFold]] / [[Parity.charFoldSql]]. Identical to the
  * interpreted `aggregate(split(s, ""), ...)` fold and to the DuckDB
  * `list_reduce(... ascii(c) ...)` fragment (both enumerate code points:
  * Spark's split('')/ascii and DuckDB's string_split('')/ascii are
  * code-point-wise for well-formed UTF-8).
  *
  * This is the inner loop of MinHash, SimHash and fingerprinting — at
  * training-corpus scale it runs per token per document, which is why it
  * is a native expression (stays inside whole-stage codegen; the
  * higher-order fold allocates a char-array per row and evaluates
  * lambdas interpreted).
  */
case class PolyHash(child: Expression, mult: Long, p: Long)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"poly_hash expects a string argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def prettyName: String = "poly_hash"

  override def nullSafeEval(v: Any): Any =
    PolyHash.hash(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString, mult, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(
      ctx,
      ev,
      c => s"graft.functions.PolyHash.hash($c.toString(), ${mult}L, ${p}L)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PolyHash {

  /** Shared by interpreted and generated code paths (named `hash`, not
    * `eval`: a companion method named like a class member gets no static
    * forwarder, which breaks the generated Java). */
  def hash(s: String, mult: Long, p: Long): Long = {
    var acc = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      acc = (acc * mult + cp) % p
    }
    acc
  }

  def apply(c: Column, mult: Long, p: Long): Column =
    ColumnBridge.column(PolyHash(ColumnBridge.expression(c), mult, p))
}
