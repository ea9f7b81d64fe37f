package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** GPT-style SEQUENCE PACKING — concatenate-then-chunk: documents are
  * laid end-to-end in a deterministic total order and the token stream
  * is cut into fixed `ctxLen` windows, so every training sequence except
  * the stratum-final one is exactly full (zero padding), and a document
  * crossing a boundary SPLITS across consecutive sequences. This is the
  * packing regime of the GPT/T5 lineage, distinct from
  * [[CorpusOps.packShards]] (whole-doc shard budgeting): shards feed
  * loaders, sequences feed the context window.
  *
  * Relational formulation (what makes it exact and oracle-checkable):
  * a per-stratum running token offset (`sum(len) OVER (ORDER BY order)`)
  * gives each doc its [start, end) slice of the stream; the doc overlaps
  * windows `start/ctxLen .. (end−1)/ctxLen`, and each overlap is one
  * output row carrying the doc-local span and its position inside the
  * sequence. No driver loop, no UDF — one window + one bounded explode
  * (a doc explodes to `len/ctxLen + ≤2` rows).
  *
  * Scale shape: the running offset is one window per stratum — strata
  * (language, source, shard) parallelize; within a stratum the window is
  * a single-partition sort, the same deliberate serialization point as
  * any exact global order (pre-shard giant strata with
  * [[CorpusOps.packShards]]'s `pack_stratum` or a date grain first, then
  * pack within shards — the offsets are per-stratum by construction, so
  * sharding changes nothing but parallelism).
  */
object SequencePack {

  /** One row per (doc × overlapped sequence):
    * `strata…, doc_id, seq_id, doc_from, doc_to, seq_from` — token
    * `t ∈ [doc_from, doc_to)` of the doc lands at sequence position
    * `seq_from + (t − doc_from)` of sequence `seq_id`. `lenCol` is the
    * doc's token count (pre-computed — tokenization is upstream's
    * contract); docs with len ≤ 0 are rejected loudly, not dropped.
    *
    * Invariants (spec-pinned): spans tile each doc exactly; every
    * sequence but the stratum-last sums to exactly `ctxLen`; `seq_from`
    * is consistent with the running offset.
    */
  def packSequences(docs: DataFrame, idCol: String, lenCol: String,
                    ctxLen: Int, strataCols: Seq[String] = Nil,
                    orderCols: Seq[String] = Nil): DataFrame = {
    require(ctxLen >= 1, s"packSequences: ctxLen=$ctxLen")
    val order: Seq[Column] =
      if (orderCols.nonEmpty) orderCols.map(col) else Seq(col(idCol))
    val w = if (strataCols.isEmpty) Window.orderBy(order: _*)
            else Window.partitionBy(strataCols.map(col): _*).orderBy(order: _*)
    val len = col(lenCol).cast("long")
    val ctx = lit(ctxLen.toLong)
    val withOff = docs
      .withColumn("_len", len)
      .withColumn("_end", sum(col("_len")).over(w))
      .withColumn("_start", col("_end") - col("_len"))
    // a non-positive length would silently corrupt every later offset in
    // its stratum — refuse the whole pack instead (checked lazily in the
    // plan, so the guard is distributed, not a driver pass)
    val guarded = withOff.withColumn("_len",
      when(col("_len") <= 0, raise_error(concat(
        lit(s"packSequences: non-positive $lenCol for $idCol="),
        col(idCol).cast("string")))).otherwise(col("_len")))
    val out = guarded
      .withColumn("seq_id",
        explode(sequence(
          (col("_start") / ctx).cast("long"),
          ((col("_end") - 1) / ctx).cast("long"))))
      .withColumn("doc_from",
        greatest(lit(0L), col("seq_id") * ctx - col("_start")))
      .withColumn("doc_to",
        least(col("_len"), (col("seq_id") + 1) * ctx - col("_start")))
      .withColumn("seq_from",
        greatest(lit(0L), col("_start") - col("seq_id") * ctx))
    out.select((strataCols.map(col) :+ col(idCol) :+ col("seq_id") :+
      col("doc_from") :+ col("doc_to") :+ col("seq_from")): _*)
  }

  /** Per-sequence fill report over [[packSequences]] output: tokens
    * packed per `seq_id` and whether the sequence is exactly full — the
    * padding-efficiency audit (only stratum-final sequences may be
    * short, so total padding ≤ strata × (ctxLen − 1)). */
  def sequenceFill(packed: DataFrame, ctxLen: Int,
                   strataCols: Seq[String] = Nil): DataFrame = {
    val keys = strataCols :+ "seq_id"
    packed.groupBy(keys.map(col): _*)
      .agg(sum(col("doc_to") - col("doc_from")).as("n_tokens"),
        count(lit(1)).as("n_docs"))
      .withColumn("full", col("n_tokens") === ctxLen.toLong)
  }
}
