package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Fused 64-bit SimHash of a token array in ONE map-side pass — the
  * Charikar sketch: each token votes ±1 on 64 bit positions from its hash;
  * bit `i` of the result is set when the majority of tokens had it set
  * (`2 * ones(i) > n`, matching the previous explode+groupBy formulation
  * bit for bit).
  *
  * The per-token hash is the first 64 bits of `md5(token)` — md5 because it
  * is the one hash both Spark and DuckDB spell identically, which is what
  * makes this sketch ORACLE-CHECKABLE (the previous xxhash64 version was
  * not) — with the nibble-order bit convention chosen so the oracle can
  * read bit `i` straight out of the hex string: bit `i` = bit `(i % 4)` of
  * the nibble at hex position `i / 4` (1-based `substr(md5(w), i/4 + 1, 1)`).
  *
  * Replaces a per-token explode (corpus × tokens rows through a groupBy
  * shuffle, 65 aggregate columns) with a zero-shuffle scalar projection —
  * at 100 TB the explode shape is a full-corpus shuffle of every token,
  * this is none.
  *
  * Returns NULL for an empty token array (no votes — the explode version
  * produced no row, callers filter). Full codegen via the shared static
  * kernel ([[HyperplaneSignatures]] pattern), so the simhash projection
  * stays inside whole-stage codegen.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (arr.numElements() == 0) null else SimHash64.simhash(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"""
         |if ($v.numElements() == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.SimHash64.simhash($v);
         |}
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** The sketch kernel over a NON-EMPTY token array, shared by eval and
    * generated code. Null tokens count toward n but cast no votes (the
    * explode+sum formulation skipped null hashes in the sums but counted
    * the row). */
  def simhash(arr: ArrayData): Long = {
    val n = arr.numElements()
    val counts = new Array[Int](64)
    val md = MinHashSignature.digest.get()
    var t = 0
    while (t < n) {
      if (!arr.isNullAt(t)) {
        md.reset()
        val d = md.digest(arr.getUTF8String(t).getBytes)
        var k = 0
        while (k < 16) {
          val b = d(k >> 1) & 0xff
          val nib = if ((k & 1) == 0) b >>> 4 else b & 0xf
          val base = k << 2
          if ((nib & 1) != 0) counts(base) += 1
          if ((nib & 2) != 0) counts(base + 1) += 1
          if ((nib & 4) != 0) counts(base + 2) += 1
          if ((nib & 8) != 0) counts(base + 3) += 1
          k += 1
        }
      }
      t += 1
    }
    var sim = 0L
    var i = 0
    while (i < 64) {
      if (2L * counts(i) > n) sim |= 1L << i
      i += 1
    }
    sim
  }
}
