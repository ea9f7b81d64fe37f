package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** CCNet perplexity bucketing: the exact (ntile) path against a plain-Scala
  * reference split, the approximate (quantile-threshold) path against the
  * exact one, and the contamination report against a set-intersection
  * reference.
  */
class CcnetSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(23)

  private def corpus(n: Int): Seq[(Long, String, String)] =
    (1L to n.toLong).map { i =>
      val lang = if (i % 3 == 0) "fr" else "en"
      // small vocab so the LM sees real frequency differences
      (i, List.fill(5 + rnd.nextInt(15))(s"w${rnd.nextInt(30)}").mkString(" "), lang)
    }

  test("perplexityBuckets == plain-Scala ntile over (score desc, id) per language") {
    val docs = corpus(60).toDF("doc_id", "text", "lang")
    val got = TextAnalysis.perplexityBuckets(docs, "doc_id", "text", "lang")
      .select("doc_id", "lang", "avg_logprob", "bucket", "bucket_name")
      .as[(Long, String, Double, Int, String)].collect()

    // reference ntile: first (count % n) buckets get the extra row
    val expected = got.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
      val sorted = rows.toSeq.sortBy(r => (-r._3, r._1))
      val n = 3
      val base = sorted.length / n
      val extra = sorted.length % n
      val sizes = (1 to n).map(k => base + (if (k <= extra) 1 else 0))
      sorted.zip(sizes.zipWithIndex.flatMap { case (sz, k) =>
        Seq.fill(sz)(k + 1)
      }).map { case (r, b) => r._1 -> b }
    }.toMap
    got.foreach { case (id, _, _, bucket, name) =>
      assert(bucket == expected(id), s"doc $id")
      val expName = if (bucket == 1) "head" else if (bucket == 3) "tail" else "middle"
      assert(name == expName)
    }
    // every language carries all three buckets at this size
    assert(got.groupBy(_._2).forall(_._2.map(_._4).toSet == Set(1, 2, 3)))
  }

  test("perplexityBucketsApprox: monotone in score, agrees with exact off-boundary") {
    val docs = corpus(90).toDF("doc_id", "text", "lang")
    val exact = TextAnalysis.perplexityBuckets(docs, "doc_id", "text", "lang")
      .select("doc_id", "bucket").as[(Long, Int)].collect().toMap
    val approx = TextAnalysis.perplexityBucketsApprox(docs, "doc_id", "text", "lang")
      .select("doc_id", "lang", "avg_logprob", "bucket", "bucket_name")
      .as[(Long, String, Double, Int, String)].collect()

    // buckets never interleave in score: higher score => bucket <= other's
    for {
      (_, rows) <- approx.groupBy(_._2)
      a <- rows; b <- rows if a._3 > b._3
    } assert(a._4 <= b._4, s"score ${a._3} in bucket ${a._4} above ${b._3} in ${b._4}")

    // same-score docs land in the same approx bucket (no arbitrary tie split)
    approx.groupBy(r => (r._2, r._3)).foreach { case (_, rows) =>
      assert(rows.map(_._4).toSet.size == 1)
    }

    // high-accuracy sketch: near-total agreement with the exact split
    val agree = approx.count(r => exact(r._1) == r._4)
    assert(agree.toDouble / approx.length >= 0.9,
      s"only $agree/${approx.length} agree with exact ntile")
  }

  test("contaminationReport == set-intersection reference, clean rows included") {
    def randDoc(): String =
      List.fill(5 + rnd.nextInt(20))(s"w${rnd.nextInt(12)}").mkString(" ")
    for (_ <- 1 to 5) {
      val corpusRows = (1L to 8L).map(i => (i, randDoc()))
      val evalRows = (101L to 104L).map(i => (i, randDoc()))
      def gramsOf(t: String) = t.split(" ").toList.sliding(3)
        .filter(_.size == 3).map(_.mkString(" ")).toSet
      val pairs = for {
        (ci, ct) <- corpusRows; (ei, et) <- evalRows
        shared = (gramsOf(ct) & gramsOf(et)).size if shared >= 2
      } yield (ei, ci, shared, shared.toDouble / gramsOf(ct).size)
      val expected = evalRows.map { case (ei, _) =>
        val hits = pairs.filter(_._1 == ei)
        ei -> (hits.size, if (hits.isEmpty) None else Some(hits.map(_._3).max),
          if (hits.isEmpty) None else Some(hits.map(_._2).min))
      }.toMap

      val got = CorpusOps.contaminationReport(
          corpusRows.toDF("doc_id", "text"), evalRows.toDF("eval_id", "etext"),
          "doc_id", "text", "eval_id", "etext", n = 3, minOverlap = 2)
        .select("eval_id", "n_contaminated_docs", "max_shared", "example_doc",
          "contaminated")
        .as[(Long, Int, Option[Long], Option[Long], Boolean)].collect()

      assert(got.length == evalRows.length, "one row per eval doc, clean included")
      got.foreach { case (ei, nDocs, maxShared, example, contaminated) =>
        val (expN, expMax, expEx) = expected(ei)
        assert(nDocs == expN, s"eval $ei")
        assert(maxShared.map(_.toInt) == expMax, s"eval $ei")
        assert(example == expEx, s"eval $ei")
        assert(contaminated == (expN > 0))
      }
    }
  }

  test("contaminationReport excludeSelf drops only the self pair") {
    val docs = Seq(
      (1L, "a b c d e f g"),
      (2L, "a b c d e f g"),            // exact dup of 1
      (3L, "x y z p q r s")).toDF("doc_id", "text")
    val eval = docs.where(col("doc_id") === 1)
    val withSelf = CorpusOps.contaminationReport(docs, eval,
        "doc_id", "text", "doc_id", "text", n = 3, minOverlap = 2)
      .select("eval_id", "n_contaminated_docs").as[(Long, Int)].collect().toMap
    val noSelf = CorpusOps.contaminationReport(docs, eval,
        "doc_id", "text", "doc_id", "text", n = 3, minOverlap = 2,
        excludeSelf = true)
      .select("eval_id", "n_contaminated_docs", "example_doc")
      .as[(Long, Int, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(withSelf(1L) == 2)           // itself + doc 2
    val (n, ex) = noSelf(1L)
    assert(n == 1 && ex.contains(2L))   // doc 2 only
  }
}
