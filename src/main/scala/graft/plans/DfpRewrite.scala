package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

import graft.sources.GraftFileIndex

/** Optimizer rule: AUTOMATIC dynamic file pruning for dim-filtered fact
  * joins over [[graft.sources.IndexedScan]] relations — the manual
  * `IndexedScan.dfpJoin` promoted to planning, the [[TopKRewrite]]
  * opt-in pattern (verdict r17 item 2).
  *
  * When an equi-join's one side scans through a [[GraftFileIndex]] and
  * the OTHER side is provably small (logical `sizeInBytes` under
  * `spark.graft.rewrite.dfp.maxDimBytes`), the rule executes the dim
  * side's distinct join keys as a bounded driver-side lookup
  * (`limit(maxKeys + 1)` — over the cap the join is left exactly as
  * written) and injects the redundant `key IN (k₁…kₙ)` filter above the
  * fact side. For `inner`/`left_semi` the filter is implied by the join
  * itself — a semantic no-op — but the existing predicate-pushdown
  * rules then carry it into `GraftFileIndex.listFiles`, where the
  * In/InSet translation prunes fact FILES through the stats ranges and
  * Bloom bits before a single fact byte is read. A plain
  * `fact.join(dim)` call site prunes files with zero plumbing.
  *
  * OPT-IN (`spark.graft.rewrite.dfp=true`, default off) and narrow:
  *  - join type `INNER` (either side may be the indexed fact) or
  *    `LEFT SEMI` (left side only — the right side never outputs rows,
  *    so only left-side file skipping pays);
  *  - join condition contains a bare `AttributeReference = AttributeReference`
  *    conjunct crossing the sides (casts/expressions: stand down);
  *  - fact side contains a [[GraftFileIndex]]-served relation; dim side
  *    does not, is non-streaming, and fits the size bound;
  *  - an In/InSet on the SAME key attribute already present anywhere in
  *    the fact side (this rule's own earlier injection — the fixpoint
  *    guard — or the user's, which already prunes) skips the join;
  *  - an empty live key set rewrites the fact side to `WHERE false`
  *    (the join can match nothing; `PropagateEmptyRelation` collapses
  *    it); null dim keys are dropped — equality never matches them.
  *
  * The dim-side lookup is one bounded job at planning time — the same
  * work `dfpJoin` does at call time, and the same trade Delta's DFP
  * makes (a broadcast-sized dim read gates a fact-table scan). A
  * `TreeNodeTag` remembers attempted-but-declined joins (over-cap dims)
  * so the optimizer's fixpoint iterations do not re-run the lookup.
  */
case class DfpRewrite() extends Rule[LogicalPlan] with PredicateHelper {

  import DfpRewrite._

  private def enabled: Boolean =
    conf.getConfString("spark.graft.rewrite.dfp", "false").toBoolean

  private def maxKeys: Int =
    conf.getConfString("spark.graft.rewrite.dfp.maxKeys", "10000").toInt

  private def maxDimBytes: Long =
    conf.getConfString("spark.graft.rewrite.dfp.maxDimBytes",
      (32L << 20).toString).toLong

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUp {
      case j @ Join(_, _, Inner | LeftSemi, Some(_), _)
          if j.getTagValue(Attempted).isEmpty =>
        tryRewrite(j).getOrElse { j.setTagValue(Attempted, true); j }
    }

  /** The indexed-scan test: the side READS THROUGH a [[GraftFileIndex]]
    * somewhere below (filters/projects above it are fine — pushdown
    * will carry the injected In the rest of the way). */
  private def indexed(side: LogicalPlan): Boolean = side.exists {
    case LogicalRelation(r: HadoopFsRelation, _, _, _, _) =>
      r.location.isInstanceOf[GraftFileIndex]
    case _ => false
  }

  /** An In/InSet on this key already sits in the side — injected by an
    * earlier fixpoint iteration, or written by the user (it already
    * prunes). Either way: done here. */
  private def alreadyPinned(side: LogicalPlan, key: Attribute): Boolean =
    side.exists {
      case Filter(cond, _) => cond.exists {
        case In(a: AttributeReference, list) =>
          a.exprId == key.exprId && list.forall(_.isInstanceOf[Literal])
        case InSet(a: AttributeReference, _) => a.exprId == key.exprId
        case _ => false
      }
      case _ => false
    }

  private def tryRewrite(j: Join): Option[LogicalPlan] = {
    val Join(left, right, joinType, Some(cond), hint) = j: @unchecked
    // one bare attribute-equality conjunct crossing the sides
    val pair = splitConjunctivePredicates(cond).collectFirst {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if left.outputSet.contains(a) && right.outputSet.contains(b) =>
        (a, b)
      case EqualTo(b: AttributeReference, a: AttributeReference)
          if left.outputSet.contains(a) && right.outputSet.contains(b) =>
        (a, b)
    }
    pair.flatMap { case (lk, rk) =>
      // (factSide=left?, factKey, dimPlan, dimKey)
      val shape: Option[(Boolean, Attribute, LogicalPlan, Attribute)] =
        if (indexed(left) && !indexed(right)) Some((true, lk, right, rk))
        else if (joinType == Inner && indexed(right) && !indexed(left))
          Some((false, rk, left, lk))
        else None
      shape.flatMap { case (factLeft, factKey, dim, dimKey) =>
        val factSide = if (factLeft) left else right
        if (dim.isStreaming || alreadyPinned(factSide, factKey) ||
            dim.stats.sizeInBytes > maxDimBytes ||
            // non-atomic equi-join key types (struct keys are legal in
            // equality joins) have no In-literal form — stand down, never
            // fail a previously-working query during optimization
            !atomicKey(factKey.dataType))
          None
        else collectKeys(dim, dimKey).flatMap { keys =>
          // Literal.apply throws on external values it cannot type
          // (belt-and-braces under the AtomicType guard above) — a failed
          // construction stands the rule down instead of failing the query
          scala.util.Try(keys.map(Literal.apply).toIndexedSeq).toOption
        }.flatMap { lits =>
          // post-coercion plan: an In mixing literal types with the key
          // (e.g. external BigDecimal → decimal(38,18) vs a decimal(10,2)
          // column) must not be fabricated — stand down instead
          if (lits.exists(_.dataType != factKey.dataType)) None
          else {
            val pinned =
              if (lits.isEmpty) Filter(Literal.FalseLiteral, factSide)
              else Filter(In(factKey, lits), factSide)
            logInfo(s"DfpRewrite: pinned ${lits.size} dim keys onto " +
              s"${factKey.name} (dim ~${dim.stats.sizeInBytes} bytes)")
            Some(
              if (factLeft) Join(pinned, right, joinType, Some(cond), hint)
              else Join(left, pinned, joinType, Some(cond), hint))
          }
        }
      }
    }
  }

  /** Only leaf (non-container) key types get In-literal pins — the
    * types `Literal.apply` round-trips from collected external rows. */
  private def atomicKey(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt match {
      case _: org.apache.spark.sql.types.StructType |
           _: org.apache.spark.sql.types.ArrayType |
           _: org.apache.spark.sql.types.MapType => false
      case _ => true
    }

  /** Distinct non-null dim keys, bounded — None past the cap (leave the
    * join unrewritten; correct, just not file-pruned). */
  private def collectKeys(dim: LogicalPlan,
                          key: Attribute): Option[Seq[Any]] = {
    val spark = SparkSession.active
    val lookup = Limit(Literal(maxKeys + 1),
      Distinct(Project(Seq(key),
        Filter(IsNotNull(key), dim))))
    val rows = org.apache.spark.sql.graft.Bridge.ofRows(spark, lookup)
      .collect()
    if (rows.length > maxKeys) {
      logInfo(s"DfpRewrite: >$maxKeys distinct dim keys — leaving join as written")
      None
    } else Some(rows.toSeq.map(_.get(0)))
  }
}

object DfpRewrite {
  /** Fixpoint guard: a join examined once (and declined — matched but
    * over-cap, or not matching at all) is not re-examined, so the
    * optimizer's iterations never repeat the dim lookup. */
  private val Attempted = TreeNodeTag[Boolean]("graft.dfp.attempted")
}
