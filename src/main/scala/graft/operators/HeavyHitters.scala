package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** EXACT heavy hitters at bounded memory — "which keys exceed s·n
  * occurrences?" answered exactly, without ever materializing the full
  * (key → count) relation (at 100 TB of tokens/URLs/hosts the distinct
  * key space is the thing that does not fit; a plain groupBy shuffles
  * all of it).
  *
  * Two passes, the classic screen-then-verify composition
  * (Misra–Gries 1982):
  *
  *  1. CANDIDATES — each partition runs a Misra–Gries summary with
  *     `cap = ⌈1/s⌉` counters (constant memory). MG guarantees any item
  *     with local frequency > n_p/(cap+1) survives its partition, and by
  *     pigeonhole a globally s-frequent item is locally s-frequent in at
  *     least one partition, with s ≥ 1/cap > 1/(cap+1) — so the union of
  *     partition survivors is a SUPERSET of the true answer (no false
  *     negatives, ever; size ≤ cap × partitions, driver-bounded by
  *     construction).
  *  2. VERIFY — one aggregation over the data with the candidate set as
  *     a broadcast `isin` (map-side `InSet`): candidates count exactly,
  *     every other key folds into a single null bucket — so the SAME
  *     scan yields the exact total n, and survivors are filtered at the
  *     exact threshold. False positives from pass 1 just verify to
  *     below-threshold counts and drop.
  *
  * Output counts are EXACT (hash-oracle-able), unlike sketch-only
  * heavy-hitter estimates; the approximation lives only in pass 1's
  * memory bound, where it is one-sided. Null keys are never reported
  * (a null "heaviest key" is a data-quality finding — see
  * [[Expectations.NotNull]] — not a frequency result).
  */
object HeavyHitters {

  /** The MG counter budget for `support`: ⌈1/s⌉. */
  def capFor(support: Double): Int = {
    require(support > 0.0 && support < 1.0, s"heavy hitters: support=$support")
    math.max(1, math.ceil(1.0 / support).toInt)
  }

  /** Per-partition Misra–Gries summaries of `keys` (a single-column
    * frame) as `(keyCol, cnt)` rows — ≤ cap rows per partition, constant
    * memory per task. The counts are the MG UNDERESTIMATES (true count
    * minus decrements), which is what makes the summaries mergeable:
    * summing them per key across partitions/batches and applying one
    * more decrement preserves the global `error ≤ n/(cap+1)` bound
    * (Agarwal et al. 2012, Mergeable Summaries). Null keys are skipped. */
  private[graft] def mgSummaries(keys: DataFrame, keyCol: String,
                                 cap: Int): DataFrame = {
    val outSchema = org.apache.spark.sql.types.StructType(
      keys.schema.fields :+
        org.apache.spark.sql.types.StructField("cnt",
          org.apache.spark.sql.types.LongType, nullable = false))
    implicit val enc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.Encoders.row(outSchema)
    keys.mapPartitions { it =>
      val counters = mutable.HashMap.empty[Any, Long]
      it.foreach { r =>
        val k = r.get(0)
        if (k != null) {
          counters.get(k) match {
            case Some(c) => counters.update(k, c + 1)
            case None if counters.size < cap => counters.update(k, 1L)
            case None =>
              // decrement-all: the MG step that buys the frequency bound
              val kept = counters.iterator
                .filter(_._2 > 1L)
                .map { case (kk, cc) => (kk, cc - 1L) }
                .toArray
              counters.clear()
              counters ++= kept
          }
        }
      }
      counters.iterator.map { case (k, c) => Row(k, c) }
    }
  }

  /** Merge MG summary rows down to ONE summary of ≤ cap counters — the
    * published mergeable-summaries step: sum counts per key, then
    * subtract the (cap+1)-th largest summed count from every key and
    * keep the positive remainders. Each such subtraction of δ removes
    * ≥ (cap+1)·δ total mass, so cumulative per-key underestimation stays
    * ≤ n/(cap+1) across ANY merge tree — an s-frequent key (s > 1/(cap+1))
    * can never reach zero. Driver cost: a top-(cap+1) collect, nothing
    * proportional to the key space. */
  private[graft] def mergeToCap(summaries: DataFrame, keyCol: String,
                                cap: Int): DataFrame = {
    val summed = summaries.groupBy(col(keyCol))
      .agg(sum(col("cnt")).as("cnt"))
    val top = summed.orderBy(col("cnt").desc).limit(cap + 1).collect()
    val delta =
      if (top.length > cap) top.last.getLong(top.last.fieldIndex("cnt"))
      else 0L
    summed.where(col("cnt") > delta)
      .select(col(keyCol), (col("cnt") - delta).as("cnt"))
  }

  /** The exact verify pass over a candidate relation: one aggregation of
    * `keys` where candidates keep their key and every other key (and
    * null keys, which never broadcast-match) folds into a single null
    * bucket — the SAME scan yields exact per-candidate counts AND the
    * exact total n, and survivors filter at the exact threshold.
    * `candidates` must be a distinct single-column (`keyCol`) relation;
    * it stays a broadcast join side, never a literal `In`. */
  private[graft] def verifyFrequent(keys: DataFrame, keyCol: String,
                                    candidates: DataFrame,
                                    support: Double): DataFrame = {
    val cand = candidates.withColumn("_cand", lit(true))
    val grouped = keys
      .join(broadcast(cand), Seq(keyCol), "left")
      .groupBy(when(col("_cand"), col(keyCol)).as(keyCol))
      .agg(count(lit(1)).as("cnt"))
    val total = grouped.agg(sum(col("cnt")).as("_n"))
    // threshold in EXACT arithmetic: a double compare (`cnt >= support*n`)
    // misclassifies boundary keys for supports with no binary
    // representation (0.005 * 2e6 evaluates to 10000.0000000000002,
    // excluding an exactly-10000 key and breaking the "exact count >=
    // s*n" contract). Rationalize s from its shortest decimal repr
    // (s = num/den, den a power of 10) and compare cnt*den >= num*n in
    // decimal(38,0) — exact, and overflow-free up to ~1e38.
    val sBd = BigDecimal(support.toString)
    val den = BigDecimal(10).pow(math.max(sBd.scale, 0))
    val num = (sBd * den).toBigIntExact.getOrElse(
      throw new IllegalArgumentException(s"frequent: support=$support not rationalizable"))
    require(num.bitLength < 63 && den.toBigInt.bitLength < 63,
      s"frequent: support=$support has too fine a decimal scale")
    grouped.crossJoin(total) // 1-row broadcast side (audited pattern)
      .where(col(keyCol).isNotNull &&
        col("cnt").cast("decimal(38,0)") * lit(den.toLong) >=
          lit(num.toLong) * col("_n").cast("decimal(38,0)"))
      .select(col(keyCol), col("cnt"))
  }

  /** Keys of `keyCol` with exact count ≥ `support × n` (n = row count of
    * `df`), as `(keyCol, cnt)`. `support ∈ (0, 1)`. */
  def frequent(df: DataFrame, keyCol: String, support: Double): DataFrame = {
    val cap = capFor(support)
    val keys = df.select(col(keyCol))
    // the candidate set STAYS a relation — never collected, never inlined
    // as literals: at cap × partitions entries a literal In would blow up
    // plan size long before anything else; a broadcast hash join gives
    // the same map-side membership probe
    val candidates = mgSummaries(keys, keyCol, cap)
      .select(col(keyCol)).distinct()
    verifyFrequent(keys, keyCol, candidates, support)
  }
}
