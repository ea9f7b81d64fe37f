package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[SequencePack]]: concatenate-then-chunk packing must tile every doc
  * exactly, fill every non-final sequence exactly, and place spans at
  * offsets consistent with the running stream position. */
class SequencePackSpec extends SparkSpec {
  import spark.implicits._

  // lengths chosen to exercise: doc inside a window (3), doc exactly
  // finishing a window, doc spanning 2 windows, doc spanning >2 windows
  // (25 over ctx=10), and a final partial window
  private lazy val docs = Seq(
    (1L, 3L), (2L, 7L),            // exactly fills window 0
    (3L, 25L),                     // spans windows 1..3
    (4L, 4L), (5L, 8L)             // 4 finishes w3; 5 spans w4; 7 tokens pad
  ).toDF("doc_id", "n_tok")

  private val ctx = 10

  test("spans tile each doc; non-final sequences exactly full; offsets consistent") {
    val packed = SequencePack.packSequences(docs, "doc_id", "n_tok", ctx)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq

    // spans tile each doc exactly: contiguous, start 0, end n_tok
    val byDoc = packed.groupBy(_._1)
    val lens = Map(1L -> 3L, 2L -> 7L, 3L -> 25L, 4L -> 4L, 5L -> 8L)
    byDoc.foreach { case (id, rows) =>
      val spans = rows.sortBy(_._2).map(r => (r._3, r._4))
      assert(spans.head._1 == 0L && spans.last._2 == lens(id),
        s"doc $id spans $spans do not cover [0, ${lens(id)})")
      spans.sliding(2).foreach {
        case Seq((_, aTo), (bFrom, _)) => assert(aTo == bFrom,
          s"doc $id spans not contiguous: $spans")
        case _ =>
      }
    }

    // every sequence except the last is exactly full
    val fill = SequencePack.sequenceFill(
        SequencePack.packSequences(docs, "doc_id", "n_tok", ctx), ctx)
      .orderBy("seq_id")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    val lastSeq = fill.map(_._1).max
    fill.foreach { case (seq, nTok, _, full) =>
      if (seq < lastSeq) assert(full && nTok == ctx, s"seq $seq not full: $nTok")
      else assert(nTok == (3 + 7 + 25 + 4 + 8) % ctx, s"final seq: $nTok")
    }

    // offset consistency: seq positions reconstruct the exact stream —
    // token t of the stream (ordered by doc_id then in-doc position)
    // lands at (seq_id, seq_from + (t − global start of its span))
    val streamPos = packed.flatMap { case (doc, seq, from, to, seqFrom) =>
      (from until to).map(t => (doc, t) -> (seq * ctx + seqFrom + (t - from)))
    }.toMap
    var expectPos = 0L
    Seq(1L -> 3L, 2L -> 7L, 3L -> 25L, 4L -> 4L, 5L -> 8L).foreach {
      case (doc, n) => (0L until n).foreach { t =>
        assert(streamPos((doc, t)) == expectPos,
          s"doc $doc token $t at ${streamPos((doc, t))}, want $expectPos")
        expectPos += 1
      }
    }
    // a doc inside one window yields one row; doc 3 (25 over ctx 10) three
    assert(byDoc(1L).size == 1 && byDoc(3L).size == 3)
  }

  test("packGreedy: no doc splits, no bin overflows, FFD packs the crafted optimum") {
    // lengths with a known optimum: 4×6 + 4×4 over ctx 10 → 4 bins (6+4
    // each); FFD finds exactly that
    val crafted = Seq(6L, 6L, 6L, 6L, 4L, 4L, 4L, 4L).zipWithIndex
      .map { case (l, i) => (i.toLong, l) }.toDF("doc_id", "n_tok")
    val packed = SequencePack.packGreedy(crafted, "doc_id", "n_tok", 10)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(packed.map(_._2).distinct.size == 4, s"FFD missed the optimum: $packed")
    // every doc exactly once, whole
    assert(packed.map(_._1).sorted == (0L until 8L))
    assert(packed.forall(r => r._4 == Map(0L->6L,1L->6L,2L->6L,3L->6L,
      4L->4L,5L->4L,6L->4L,7L->4L)(r._1)))
    // bins never overflow and offsets tile without overlap
    packed.groupBy(_._2).foreach { case (bin, rows) =>
      assert(rows.map(_._4).sum <= 10, s"bin $bin overflows")
      val spans = rows.sortBy(_._3).map(r => (r._3, r._3 + r._4))
      spans.sliding(2).foreach {
        case Seq((_, aTo), (bFrom, _)) =>
          assert(aTo <= bFrom, s"bin $bin overlaps: $spans")
        case _ =>
      }
    }
    // deterministic
    assert(SequencePack.packGreedy(crafted, "doc_id", "n_tok", 10)
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted == packed.sorted)
  }

  test("packGreedy: strata independent; randomized fill stays near-optimal; oversize rejected") {
    val rng = new scala.util.Random(11L)
    val rand = (0 until 500).map(i =>
      (if (i % 2 == 0) "en" else "de", i.toLong, (rng.nextInt(900) + 100).toLong))
      .toDF("lang", "doc_id", "n_tok")
    val packed = SequencePack.packGreedy(rand, "doc_id", "n_tok", 1000,
      strataCols = Seq("lang"))
    val fill = packed.groupBy("lang", "seq_id")
      .agg(org.apache.spark.sql.functions.sum("len").as("filled"))
      .as[(String, Long, Long)].collect()
    assert(fill.forall(_._3 <= 1000))
    // FFD ≤ 11/9·OPT + 1 and OPT ≥ ⌈total/ctx⌉ per stratum
    fill.groupBy(_._1).foreach { case (lang, rows) =>
      val total = rows.map(_._3).sum
      val lb = (total + 999) / 1000
      assert(rows.size <= (11 * lb) / 9 + 1,
        s"$lang: ${rows.size} bins vs lower bound $lb — FFD bound broken")
    }
    // all docs packed whole, exactly once, within their own stratum
    assert(packed.count() == 500)
    val e = intercept[Exception] {
      SequencePack.packGreedy(Seq((1L, 2000L)).toDF("doc_id", "n_tok"),
        "doc_id", "n_tok", 1000).collect()
    }
    assert(e.getMessage.contains("no-split packing never truncates"))
  }

  test("packGreedy: null stratum values never alias across columns") {
    // (en, null) and (null, en) must be DIFFERENT strata — a key built
    // with plain concat_ws (which skips nulls) would merge them and then
    // duplicate every row in the strata join-back
    val docs = Seq(
      (Option("en"), Option.empty[String], 1L, 4L),
      (Option.empty[String], Option("en"), 2L, 4L))
      .toDF("lang", "source", "doc_id", "n_tok")
    val packed = SequencePack.packGreedy(docs, "doc_id", "n_tok", 10,
        strataCols = Seq("lang", "source"))
      .as[(Option[String], Option[String], Long, Long, Long, Long)]
      .collect().toSeq
    assert(packed.size == 2, s"rows duplicated or lost: $packed")
    // each doc stays in its own stratum, each stratum packs its own bin 0
    assert(packed.toSet == Set(
      (Some("en"), None, 1L, 0L, 0L, 4L),
      (None, Some("en"), 2L, 0L, 0L, 4L)))
  }

  test("strata pack independently; non-positive length fails loudly") {
    val strat = Seq(("en", 1L, 7L), ("en", 2L, 7L), ("de", 3L, 4L))
      .toDF("lang", "doc_id", "n_tok")
    val packed = SequencePack.packSequences(strat, "doc_id", "n_tok", 10,
        strataCols = Seq("lang"))
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    // each stratum starts its own stream at offset 0
    assert(packed.filter(_._1 == "de") ==
      Seq(("de", 3L, 0L, 0L, 4L, 0L)))
    assert(packed.filter(r => r._1 == "en" && r._2 == 2L).map(_._3).toSet ==
      Set(0L, 1L)) // doc 2 spans the en windows 0→1 (7+7 over ctx 10)

    val bad = Seq((1L, 0L)).toDF("doc_id", "n_tok")
    val e = intercept[Exception] {
      SequencePack.packSequences(bad, "doc_id", "n_tok", 10).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("non-positive"))
  }
}
