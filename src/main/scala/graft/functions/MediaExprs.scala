package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** Per-frame energy of a binary payload read as unsigned 8-bit PCM:
  * the payload is chunked into `frameLen`-sample frames (tail partial
  * frame included) and each frame reports `Σ (b − 128)²` — the integer
  * short-time energy a voice-activity / silence detector thresholds.
  * This is the audio member of the multimodal family: the DECODE is the
  * documented stand-in (payload bytes as PCM — swap a real codec into
  * the same expression at the marked line), the framing/windowed-energy
  * plumbing is the real pipeline shape.
  *
  * One codegen'd pass per row where the payload lives — no explode of
  * samples, no shuffle; a clip's frame vector is ~payload/256 longs.
  * The DuckDB oracle re-derives the frames from the hex dump of the
  * same bytes (`hex → nibble pairs → (b−128)²` list fold).
  */
case class FrameEnergies(child: Expression, frameLen: Int) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"frame_energies expects binary, got ${t.simpleString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "frame_energies"

  override def nullSafeEval(v: Any): Any =
    FrameEnergies.energies(v.asInstanceOf[Array[Byte]], frameLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.FrameEnergies.energies($c, $frameLen)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object FrameEnergies {

  /** Shared by interpreted and generated code paths (named `energies`,
    * not `eval` — see the static-forwarder note on [[PolyHash.hash]]).
    * Real-codec swap point: decode `payload` to samples here.
    */
  def energies(payload: Array[Byte], f: Int): ArrayData = {
    val n = payload.length
    val out = new Array[Long]((n + f - 1) / f)
    var i = 0
    while (i < n) {
      val d = (payload(i) & 0xff) - 128
      out(i / f) += (d * d).toLong
      i += 1
    }
    new GenericArrayData(out)
  }

  def apply(payload: Column, frameLen: Int): Column =
    ColumnBridge.column(FrameEnergies(ColumnBridge.expression(payload), frameLen))
}
