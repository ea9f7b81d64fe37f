package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Deterministic ±1 random hyperplanes, shared by the Spark expression and
  * the DuckDB oracle-SQL generator (seeded, so both sides see byte-identical
  * plane literals). Table `t` uses seed `seed + t`.
  */
object Hyperplanes {
  def planes(nPlanes: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes)(Array.fill(dim)(if (rnd.nextBoolean()) 1.0 else -1.0))
  }

  def tables(nTables: Int, planesPerTable: Int, dim: Int, seed: Long): Array[Array[Array[Double]]] =
    Array.tabulate(nTables)(t => planes(planesPerTable, dim, seed + t))

  /** DuckDB-side dot product of `v` with a ±1 plane, as a left-associative
    * sum — bitwise-identical to the expression's sequential fold
    * ((0.0 + v₀·s₀) + v₁·s₁ + …; ±1 multiplies are exact, x + (-y) ≡ x - y).
    */
  def planeDotSql(plane: Array[Double], v: String): String =
    plane.zipWithIndex.map { case (s, i) =>
      (if (s > 0) " + " else " - ") + s"$v[${i + 1}]"
    }.mkString("(0.0", "", ")")

  /** DuckDB-side bucket signature of one table (sum of per-plane bits). */
  def signatureSql(planes: Array[Array[Double]], v: String): String =
    planes.zipWithIndex.map { case (p, b) =>
      s"(CASE WHEN ${planeDotSql(p, v)} >= 0 THEN ${1 << b} ELSE 0 END)"
    }.mkString("(", " + ", ")")
}

/** Fused random-hyperplane LSH signatures: ALL `nTables` bucket signatures
  * of a vector in one pass, one `int` per table (bit `b` set when
  * `dot(vec, plane_b) >= 0`).
  *
  * Replaces the interpreted `aggregate(zip_with(...))` per-plane composition
  * (one HigherOrderFunction walk per plane per table — 48 interpreted array
  * traversals per vector at the default 12×4 configuration) with a single
  * fused loop, the same treatment [[MinHashSignature]] gives the text
  * sketch. The dot is a sequential ascending-index fold so the DuckDB
  * oracle's left-associative sum ([[Hyperplanes.planeDotSql]]) reproduces it
  * bitwise.
  *
  * Full codegen (R12, the [[UnitNormalize]] treatment): the kernel is a
  * static helper shared by eval and the generated code — identical
  * arithmetic either way — with the plane tables attached once per codegen
  * instance via `addReferenceObj`. Accepts float arrays too (widened
  * exactly as `CAST(x AS DOUBLE)` would), so call sites can feed the RAW
  * embedding column and the whole projection stays in one codegen span.
  */
case class HyperplaneSignatures(child: Expression, nTables: Int,
                                planesPerTable: Int, dim: Int, seed: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_signatures expects array<float|double>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "hyperplane_signatures"

  @transient private lazy val tables: Array[Array[Array[Double]]] =
    Hyperplanes.tables(nTables, planesPerTable, dim, seed)

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(HyperplaneSignatures.signatures(
      input.asInstanceOf[ArrayData], isFloat, tables, dim))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => {
      val tablesRef = ctx.addReferenceObj("lshTables", tables, "double[][][]")
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.HyperplaneSignatures.signatures($v, $isFloat, $tablesRef, $dim))"
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSignatures =
    copy(child = newChild)
}

object HyperplaneSignatures {
  /** The signature kernel — one vector copy, then a fused dot/sign loop per
    * (table, plane). Fails fast on length mismatch or null elements:
    * silently truncating (or zero-padding) would diverge from the oracle
    * SQL, which indexes v[1..dim] and folds out-of-range NULLs to bit 0. */
  def signatures(v: ArrayData, isFloat: Boolean,
                 tables: Array[Array[Array[Double]]], dim: Int): Array[Int] = {
    if (v.numElements() != dim) throw new IllegalArgumentException(
      s"hyperplane_signatures: expected array of length $dim, got ${v.numElements()}")
    val vec = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      if (v.isNullAt(i)) throw new IllegalArgumentException(
        s"hyperplane_signatures: null element at index $i")
      vec(i) = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      i += 1
    }
    val nTables = tables.length
    val sigs = new Array[Int](nTables)
    var t = 0
    while (t < nTables) {
      val planes = tables(t)
      var sig = 0
      var b = 0
      while (b < planes.length) {
        val plane = planes(b)
        var dot = 0.0
        i = 0
        while (i < dim) { dot += vec(i) * plane(i); i += 1 }
        if (dot >= 0) sig |= 1 << b
        b += 1
      }
      sigs(t) = sig
      t += 1
    }
    sigs
  }
}
