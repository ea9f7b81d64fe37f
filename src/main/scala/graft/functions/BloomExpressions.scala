package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Map-side Bloom-filter membership probe over a string column — the
  * shuffle-avoidance primitive for incremental dedup: a daily shard
  * probing a multi-billion-row fingerprint store only needs the JOIN for
  * rows the filter might know; everything else drops AT THE SCAN, before
  * any exchange. The filter bytes ride the plan as a literal (serialized
  * once on the driver, deserialized once per task via the transient lazy),
  * exactly like the literal merge tables in [[BpeExpressions]].
  *
  * Guarantee asymmetry is the point: NO false negatives (a true member
  * always passes, so downstream equi-join results are IDENTICAL with or
  * without the prefilter — provable, and pinned in DedupStoreSpec), false
  * positives at the configured fpp merely forward a few extra rows into
  * the join that then match nothing. Probing uses the same UTF-8 bytes
  * `BloomFilter.putString` hashes, so build and probe agree on any input.
  */
case class BloomMightContain(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  // Array[Byte] equals/hashCode are reference-based, which would make two
  // semantically identical probes never compare equal — defeating expression
  // canonicalization and common-subexpression reuse. Compare the bytes by
  // value instead (the child comparison rides the case-class product).
  override def equals(other: Any): Boolean = other match {
    case BloomMightContain(c, bytes) =>
      c == child && java.util.Arrays.equals(bytes, bloomBytes)
    case _ => false
  }

  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(bloomBytes)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = BooleanType

  override def prettyName: String = "bloom_might_contain"

  override protected def nullSafeEval(input: Any): Any =
    bloom.mightContainBinary(input.asInstanceOf[UTF8String].getBytes)

  /** Full codegen — this sits in the SCAN's hot path (the whole point is
    * probing before any exchange), so falling out of whole-stage codegen
    * would tax every row of the shard. The deserialized filter is attached
    * once per codegen instance via `addReferenceObj`; generated code is
    * one virtual call per row. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => {
      val bloomRef = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
      s"$bloomRef.mightContainBinary($c.getBytes())"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
