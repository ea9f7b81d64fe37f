package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused MinHash signature: all `numHashes` salted min-wise hashes of a
  * shingle array in ONE pass with a thread-local MessageDigest.
  *
  * Computes exactly `min over shingles of md5("<k>|" + shingle)` for
  * k = 0..numHashes-1 — the same function as the `transform`/`array_min`
  * composition in [[TextFunctions.minhash]] and the DuckDB oracle, but
  * ~10× faster: the lambda version walks the array through an interpreted
  * HigherOrderFunction once per salt and allocates an md5 hex string per
  * (shingle, salt); this loop hashes each shingle `numHashes` times
  * in-place and keeps raw 16-byte minima (unsigned byte order over the
  * digest == lexicographic order over its hex encoding, so the minima are
  * identical), hex-encoding only the winners.
  *
  * Full codegen (the [[HyperplaneSignatures]] static-kernel pattern): the
  * kernel is one static method shared by eval and the generated code, so
  * the dedup signature projection — the highest-volume map pass in the
  * LLM-pipeline path — stays inside one whole-stage-codegen span instead
  * of expelling its entire projection to interpreted eval.
  */
case class MinHashSignature(child: Expression, numHashes: Int, shingleSize: Int = 1)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  // a non-empty word array still yields NULL when it is shorter than the
  // shingle size (no shingles to hash) — independent of child nullability
  override def nullable: Boolean = true

  override def prettyName: String = "minhash_signature"

  @transient private lazy val saltPrefixes: Array[Array[Byte]] =
    MinHashSignature.salts(numHashes)

  override protected def nullSafeEval(input: Any): Any =
    MinHashSignature.signature(
      input.asInstanceOf[ArrayData], shingleSize, saltPrefixes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val saltsRef = ctx.addReferenceObj("salts", saltPrefixes, "byte[][]")
      s"""
         |${ev.value} = graft.functions.MinHashSignature.signature(
         |  $v, $shingleSize, $saltsRef);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** Distinct space-joined word k-shingles as one fused pass (the native
  * sibling of `TextFunctions.shingles` for the exact-Jaccard hot path).
  * First-occurrence order, matching `array_distinct` semantics.
  * Full codegen via the shared static kernel. */
case class ShingleSet(child: Expression, shingleSize: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_set expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "shingle_set"

  override protected def nullSafeEval(input: Any): Any =
    ShingleSet.shingles(input.asInstanceOf[ArrayData], shingleSize)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.ShingleSet.shingles($v, $shingleSize)")

  override protected def withNewChildInternal(newChild: Expression): ShingleSet =
    copy(child = newChild)
}

object ShingleSet {
  /** The shingle kernel, shared by eval and generated code. Never null:
    * a too-short word array yields an empty shingle set. */
  def shingles(arr: ArrayData, shingleSize: Int): GenericArrayData = {
    val n = arr.numElements()
    val nShingles = n - shingleSize + 1
    if (nShingles <= 0) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String](nShingles * 2)
    val words = Array.tabulate(n)(i => arr.getUTF8String(i))
    val space = UTF8String.fromString(" ")
    var i = 0
    while (i < nShingles) {
      val parts = new Array[UTF8String](2 * shingleSize - 1)
      var w = 0
      while (w < shingleSize) {
        parts(2 * w) = words(i + w)
        if (w < shingleSize - 1) parts(2 * w + 1) = space
        w += 1
      }
      seen.add(UTF8String.concat(parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]].map(_.asInstanceOf[Any]))
  }
}

object MinHashSignature {
  private[functions] val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  def salts(numHashes: Int): Array[Array[Byte]] =
    (0 until numHashes).map(k => s"$k|".getBytes("UTF-8")).toArray

  /** The signature kernel, shared by eval and generated code. With
    * shingleSize > 1 the input is the WORD array and the space-joined
    * k-shingles are built inline — no intermediate shingle array, no
    * distinct (the min is duplicate-invariant, so values equal the
    * distinct-shingle composition the oracle uses). Returns null when no
    * shingles exist (word array shorter than the shingle size). */
  def signature(arr: ArrayData, shingleSize: Int,
                saltPrefixes: Array[Array[Byte]]): GenericArrayData = {
    val numHashes = saltPrefixes.length
    val n = arr.numElements()
    val nShingles = if (shingleSize == 1) n else n - shingleSize + 1
    if (nShingles <= 0) return null
    val md = digest.get()
    val mins = new Array[Array[Byte]](numHashes)
    val words: Array[Array[Byte]] =
      if (shingleSize == 1) null
      else Array.tabulate(n)(i => arr.getUTF8String(i).getBytes)
    var i = 0
    while (i < nShingles) {
      val shingle: Array[Byte] =
        if (shingleSize == 1) arr.getUTF8String(i).getBytes
        else {
          var len = shingleSize - 1
          var w = 0
          while (w < shingleSize) { len += words(i + w).length; w += 1 }
          val out = new Array[Byte](len)
          var pos = 0
          w = 0
          while (w < shingleSize) {
            val src = words(i + w)
            System.arraycopy(src, 0, out, pos, src.length)
            pos += src.length
            if (w < shingleSize - 1) { out(pos) = ' '; pos += 1 }
            w += 1
          }
          out
        }
      var k = 0
      while (k < numHashes) {
        md.reset()
        md.update(saltPrefixes(k))
        md.update(shingle)
        val d = md.digest()
        if (mins(k) == null || unsignedCompare(d, mins(k)) < 0)
          mins(k) = d
        k += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(d => UTF8String.fromString(hex(d))))
  }

  private def unsignedCompare(a: Array[Byte], b: Array[Byte]): Int = {
    var i = 0
    while (i < a.length && i < b.length) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    a.length - b.length
  }

  private val hexChars = "0123456789abcdef".toCharArray
  private def hex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      out(2 * i) = hexChars((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = hexChars(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }
}
