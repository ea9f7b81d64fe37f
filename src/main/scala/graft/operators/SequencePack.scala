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
    * `orderCols` (default: the id) must be a TOTAL order — ties would
    * make the running offsets, and with them every span, run-dependent.
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

  /** NO-SPLIT greedy packing — the SFT/instruction-tuning regime, where
    * a document must never split across sequences (a truncated
    * instruction pair is a corrupted example), so packing is bin packing
    * proper. Per stratum, docs sort by length descending and first-fit
    * into bins of capacity `ctxLen` — first-fit-decreasing, whose bin
    * count is ≤ 11/9·OPT + 6/9 (Dósa 2007): near-optimal padding from a
    * deterministic greedy. Docs longer than `ctxLen` are REJECTED loudly
    * (truncation is an upstream decision, never an implicit one here).
    *
    * Output: `strata…, doc_id, seq_id, seq_from, len` — whole docs at
    * offsets, no spans. Scale: strata parallelize (`flatMapGroups`, one
    * task per stratum); within a stratum the greedy is sequential and
    * the stratum's (id, len) pairs are held in executor memory
    * (16 B/doc) — pre-shard giant strata, the same documented
    * serialization as [[packSequences]]'s window. Deterministic: ties
    * break on id, bins scan in creation order. `idCol` must cast to
    * long (the repo-wide doc-id convention). */
  def packGreedy(docs: DataFrame, idCol: String, lenCol: String,
                 ctxLen: Int, strataCols: Seq[String] = Nil): DataFrame = {
    require(ctxLen >= 1, s"packGreedy: ctxLen=$ctxLen")
    val spark = docs.sparkSession
    import spark.implicits._
    val keyExpr =
      if (strataCols.isEmpty) lit("")
      // concat_ws SKIPS nulls, which would alias (a, null) with
      // (null, a) — coalesce each part to a sentinel that itself
      // contains NUL, unreachable by any real (NUL-free) value
      else concat_ws("\u0000", strataCols.map(c =>
        coalesce(col(c).cast("string"), lit("\u0000NULL"))): _*)
    val keyed = docs.select(keyExpr.as("_k"),
        col(idCol).cast("long").as("_id"), col(lenCol).cast("long").as("_len"))
      .as[(String, Long, Long)]
    val packed = keyed.groupByKey(_._1).flatMapGroups { (k, it) =>
      val ds = it.map(t => (t._2, t._3)).toArray
      ds.foreach { case (id, len) =>
        if (len < 1 || len > ctxLen) throw new IllegalArgumentException(
          s"packGreedy: $lenCol=$len for $idCol=$id outside [1, $ctxLen] — " +
            "truncate or split upstream; no-split packing never truncates")
      }
      val sorted = ds.sortBy { case (id, len) => (-len, id) }
      val binFree = scala.collection.mutable.ArrayBuffer.empty[Long]
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long, Long, Long)]
      sorted.foreach { case (id, len) =>
        var b = 0
        while (b < binFree.length && binFree(b) < len) b += 1
        if (b == binFree.length) binFree += ctxLen.toLong
        val off = ctxLen.toLong - binFree(b)
        binFree(b) -= len
        out += ((k, id, b.toLong, off, len))
      }
      out.iterator
    }.toDF("_k", idCol, "seq_id", "seq_from", "len")
    if (strataCols.isEmpty) packed.drop("_k")
    else {
      val strata = docs.select((strataCols.map(col) :+ keyExpr.as("_k")): _*)
        .distinct()
      packed.join(broadcast(strata), Seq("_k")).drop("_k")
        .select((strataCols.map(col) :+ col(idCol) :+ col("seq_id") :+
          col("seq_from") :+ col("len")): _*)
    }
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
