package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Column-level perceptual image hash: decode a BMP payload and compute
  * its 64-bit dHash ([[graft.ext.Multimodal.dHash64]]) in ONE kernel eval
  * per row — the native-`Expression` form that makes the perceptual key
  * usable anywhere a `Column` is (scan predicates, streaming dedup keys,
  * groupBy) without a Scala UDF and without leaving the codegen'd stage.
  * Malformed/non-BMP payloads fail loudly, exactly like the Dataset path
  * (`Multimodal.imageDHash`) — a dedup key must never silently hash
  * garbage. */
case class ImageDHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"ImageDHash requires a binary input, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    // magic-byte dispatch (BMP/P6/PNG/JPEG/GIF) — the cross-format
    // re-encode-dedup property lives here: lossless containers of the
    // same pixels produce the IDENTICAL perceptual key
    val (w, h, px) = graft.ext.Multimodal.imagePixels(b)
    graft.ext.Multimodal.dHash64(px, w, h)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("imageDHash", this, getClass.getName)
      s"${ev.value} = ((java.lang.Long) $ref.nullSafeEval($c)).longValue();"
    })

  override protected def withNewChildInternal(newChild: Expression): ImageDHash =
    copy(child = newChild)
}
