package graft.operators

import graft.SparkSpec

class CurateSpec extends SparkSpec {
  import spark.implicits._

  private val en = "the cat and the dog walked to the house in the morning sun"

  test("curate: every reason fires with the declared precedence") {
    val docs = Seq(
      1L -> en,                                     // kept (canonical of 2,3)
      2L -> en,                                     // exact_duplicate of 1
      3L -> (en + " extra words here today"),       // near_duplicate of 1
      4L -> "le chat et la maison des amis dans le jardin", // wrong_language
      5L -> "x",                                    // low_quality (<5 words)
      6L -> ("!!! ??? ;;; ### " + en + " !!!! ????? ;;; ### @@@ %%% ^^^ &&& *" * 3), // low quality (punct)
      7L -> "a completely different english sentence about the sea and the ships it holds"
    ).toDF("doc_id", "text")
    val out = Curate.curate(docs, "doc_id", "text",
        minQuality = 0.5, lang = Some("en"), jaccardThreshold = 0.3)
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getString(2), Option(r.get(3)).map(_.asInstanceOf[Long])))
      .toMap
    assert(out(1L) == ((true, "kept", Some(1L))))
    assert(out(2L) == ((false, "exact_duplicate", Some(1L))))
    assert(out(3L) == ((false, "near_duplicate", Some(1L))))
    assert(out(4L) == ((false, "wrong_language", None)))
    assert(out(5L) == ((false, "low_quality", None)))
    assert(out(6L)._2 == "low_quality")
    assert(out(7L) == ((true, "kept", Some(7L))))
  }

  test("curate: precedence — a low-quality wrong-language dup reports low_quality") {
    val docs = Seq(
      1L -> "le chat", // <5 words AND non-English
      2L -> "le chat"  // and an exact dup of 1
    ).toDF("doc_id", "text")
    val out = Curate.curate(docs, "doc_id", "text")
      .select("doc_id", "reason").as[(Long, String)].collect().toMap
    assert(out(1L) == "low_quality" && out(2L) == "low_quality")
  }

  test("curate: exact dup whose canonical is itself a near-dup chains to the kept doc") {
    val base = "the cat and the dog walked to the house in the morning sun"
    val docs = Seq(
      0L -> base,                        // kept: cluster canonical
      1L -> (base + " with more words"), // near_duplicate of 0
      2L -> (base + " with more words")  // exact dup of 1 -> canonical must be 0, not 1
    ).toDF("doc_id", "text")
    val out = Curate.curate(docs, "doc_id", "text", jaccardThreshold = 0.3)
      .collect().map(r => r.getLong(0) -> (r.getString(2), r.getLong(3))).toMap
    assert(out(0L) == (("kept", 0L)))
    assert(out(1L) == (("near_duplicate", 0L)))
    assert(out(2L) == (("exact_duplicate", 0L))) // chained through discarded 1
  }

  test("curate: empty/degenerate text is low_quality, not a crash (ANSI divide-by-zero)") {
    val docs = Seq(1L -> "", 2L -> "   ",
      3L -> "the cat and the dog walked to the house").toDF("doc_id", "text")
    val out = Curate.curate(docs, "doc_id", "text", lang = None)
      .select("doc_id", "reason").as[(Long, String)].collect().toMap
    assert(out(1L) == "low_quality" && out(2L) == "low_quality" && out(3L) == "kept")
  }

  test("curate: lang=None disables the language filter") {
    val docs = Seq(
      1L -> "le chat et la maison des amis dans le jardin pres de la mer"
    ).toDF("doc_id", "text")
    val out = Curate.curate(docs, "doc_id", "text", lang = None)
      .select("reason").as[String].head()
    assert(out == "kept")
  }
}
