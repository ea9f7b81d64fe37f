package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding tokenization (Sennrich et al. 2016, "Neural Machine
  * Translation of Rare Words with Subword Units") — real subword token
  * counts for training-data budgets instead of the whitespace
  * approximation.
  *
  * Split of labor: [[Bpe.train]] learns the merge table DRIVER-SIDE from a
  * bounded text sample (training is inherently sequential — each merge
  * depends on the counts after the previous one — and standard practice
  * is fitting on a sample, like the IVF quantizer's capped fit set);
  * [[BpeTokens]] applies the learned table distributed, one fused
  * expression per document, with a per-thread word cache (natural-language
  * word frequency is Zipfian, so virtually every encode is a cache hit).
  */
object Bpe {

  /** End-of-word marker (the paper's convention): appended to each word's
    * final symbol so merges never cross word boundaries and a word-final
    * subword is distinct from the same subword mid-word. */
  val EndOfWord = "</w>"

  /** A word as its initial symbol sequence: CODEPOINTS (a surrogate pair
    * — emoji, CJK extension planes — is one symbol, never two lone
    * surrogates that UTF-8 encoding would mangle to '?'), with
    * [[EndOfWord]] glued to the last one. */
  def symbols(word: String): Vector[String] = {
    val cs = Vector.newBuilder[String]
    var i = 0
    while (i < word.length) {
      val n = Character.charCount(word.codePointAt(i))
      cs += word.substring(i, i + n)
      i += n
    }
    val v = cs.result()
    v.init :+ (v.last + EndOfWord)
  }

  // Locale.ROOT: Spark's lower() is locale-independent, and a default-locale
  // lowercase (tr_TR: 'I' -> dotless 'ı') would let the driver-trained table,
  // executor tokenization and SQL oracles diverge across JVMs
  private def pretokenize(text: String): Array[String] =
    text.toLowerCase(java.util.Locale.ROOT).trim.split("\\s+").filter(_.nonEmpty)

  /** Learn `numMerges` merges from the sample's word frequencies.
    * Deterministic: the most frequent adjacent symbol pair wins each
    * round, ties broken by lexicographic pair order — same corpus, same
    * table, on any engine. */
  def train(texts: IterableOnce[String], numMerges: Int): Array[(String, String)] = {
    require(numMerges >= 1, s"numMerges=$numMerges must be >= 1")
    // distinct words with frequencies; each word is a mutable symbol seq
    val freq = mutable.LinkedHashMap.empty[String, Long]
    texts.iterator.foreach(t => pretokenize(t).foreach(w =>
      freq.update(w, freq.getOrElse(w, 0L) + 1L)))
    if (freq.isEmpty) return Array.empty
    var words: Array[(Vector[String], Long)] =
      freq.iterator.map { case (w, n) => (symbols(w), n) }.toArray
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    var exhausted = false
    while (round < numMerges && !exhausted) {
      val counts = mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + n)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val best = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }._1
        merges += best
        val joined = best._1 + best._2
        words = words.map { case (syms, n) => (mergeOnce(syms, best, joined), n) }
      }
      round += 1
    }
    merges.toArray
  }

  /** Convenience: fit on up to `maxDocs` documents of a DataFrame column —
    * the bounded driver-side sample (hard cap via limit, the Ivf.fit
    * convention). */
  def trainOn(df: org.apache.spark.sql.DataFrame, textCol: String,
              numMerges: Int, maxDocs: Int = 10000): Array[(String, String)] =
    train(df.select(textCol).limit(maxDocs).collect().map(_.getString(0))
      .filter(_ != null), numMerges)

  private def mergeOnce(syms: Vector[String], pair: (String, String),
                        joined: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += joined
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.result()
  }

  /** Greedy reference encoder: repeatedly apply the LOWEST-RANK applicable
    * merge (all its occurrences, left to right) until none applies — the
    * paper's inference procedure. [[BpeTokens]] computes exactly this;
    * this plain-Scala twin is the property-test oracle. */
  def encode(word: String, ranks: Map[(String, String), Int]): Vector[String] = {
    if (word.isEmpty) return Vector.empty
    var syms = symbols(word)
    var done = false
    while (!done && syms.length > 1) {
      var best: (String, String) = null
      var bestRank = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; best = (syms(i), syms(i + 1)) }
        i += 1
      }
      if (best == null) done = true
      else syms = mergeOnce(syms, best, best._1 + best._2)
    }
    syms
  }

  /** Tokenize a whole text with the reference encoder (pre-tokenization =
    * lowercase whitespace words, matching `TextFunctions.normWords`). */
  def encodeText(text: String, merges: Seq[(String, String)]): Vector[String] = {
    val ranks = merges.zipWithIndex.toMap
    pretokenize(text).iterator.flatMap(encode(_, ranks)).toVector
  }
}

/** Fused BPE tokenizer over a string column: pre-tokenizes to lowercase
  * whitespace words, greedily applies the literal merge table per word,
  * emits the concatenated subword array (`size(...)` of it is the real
  * token count). Map-side scalar, zero shuffles; a per-thread,
  * bounded word→subwords cache exploits the Zipfian word distribution so
  * steady-state throughput is a hash lookup per word. The merge table is
  * part of the expression (query-constant, serialized with the plan) —
  * the [[MinHashSignature]] convention for literal parameters.
  *
  * Full codegen WITHOUT a static kernel: the cache and rank table are
  * per-instance state, so the generated code references the expression
  * instance itself (`addReferenceObj`) and calls [[evalKernel]] — one
  * virtual call per row, but the projection stays inside whole-stage
  * codegen instead of being expelled wholesale (what CodegenFallback
  * would do to every co-projected column).
  */
case class BpeTokens(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_tokens expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "bpe_tokens"

  @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      // a space never occurs inside a symbol (symbols come from text
      // characters + the "</w>" marker), so the joined key is injective
      m.put(a + " " + b, i)
    }
    m
  }

  // word→subwords, per thread, bounded: cleared wholesale when full (a
  // Zipfian stream refills the hot head immediately; eviction bookkeeping
  // would cost more than the occasional refill)
  @transient private lazy val cache =
    new ThreadLocal[java.util.HashMap[String, Array[UTF8String]]] {
      override def initialValue() = new java.util.HashMap(1 << 14)
    }
  private val MaxCacheEntries = 1 << 16

  override protected def nullSafeEval(input: Any): Any =
    evalKernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
                                   ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, v => {
      val ref = ctx.addReferenceObj("bpe", this, "graft.functions.BpeTokens")
      s"$ref.evalKernel($v)"
    })

  /** The tokenize kernel — shared verbatim by interpreted eval and the
    * generated code (never null: empty text yields an empty array). */
  def evalKernel(input: UTF8String): GenericArrayData = {
    val text = input.toString
    val words = text.toLowerCase(java.util.Locale.ROOT).trim.split("\\s+")
    val c = cache.get()
    val out = mutable.ArrayBuffer.empty[UTF8String]
    words.foreach { w =>
      if (w.nonEmpty) {
        var toks = c.get(w)
        if (toks == null) {
          toks = encodeWord(w)
          if (c.size() >= MaxCacheEntries) c.clear()
          c.put(w, toks)
        }
        out ++= toks
      }
    }
    new GenericArrayData(out.toArray[Any])
  }

  private def encodeWord(word: String): Array[UTF8String] = {
    // symbol list as a growable array (CODEPOINT granularity, matching
    // Bpe.symbols — surrogate pairs stay whole); greedy lowest-rank loop
    var syms = new java.util.ArrayList[String](word.length)
    var i = 0
    while (i < word.length) {
      val n = Character.charCount(word.codePointAt(i))
      val s = word.substring(i, i + n)
      i += n
      syms.add(if (i >= word.length) s + Bpe.EndOfWord else s)
    }
    var done = false
    while (!done && syms.size > 1) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var j = 0
      while (j < syms.size - 1) {
        val r = ranks.get(syms.get(j) + " " + syms.get(j + 1))
        if (r != null && r < bestRank) { bestRank = r; bestAt = j }
        j += 1
      }
      if (bestAt < 0) done = true
      else {
        // merge ALL occurrences of the winning pair, left to right
        val a = syms.get(bestAt)
        val b = syms.get(bestAt + 1)
        val next = new java.util.ArrayList[String](syms.size)
        var k = 0
        while (k < syms.size) {
          if (k < syms.size - 1 && syms.get(k) == a && syms.get(k + 1) == b) {
            next.add(a + b)
            k += 2
          } else {
            next.add(syms.get(k))
            k += 1
          }
        }
        syms = next
      }
    }
    val out = new Array[UTF8String](syms.size)
    var k = 0
    while (k < syms.size) { out(k) = UTF8String.fromString(syms.get(k)); k += 1 }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokens =
    copy(child = newChild)
}
