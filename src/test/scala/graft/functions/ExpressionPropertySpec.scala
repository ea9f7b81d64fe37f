package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.SparkSpec
import org.apache.spark.sql.graft.Bridge

/** Randomized-property tests: every fused native expression must agree
  * with an INDEPENDENT plain-Scala reference implementation on random
  * inputs (seeded, 30 cases each) — the hand-written hot loops (salted
  * minima, nibble bit packing, signed projections) are exactly where an
  * off-by-one survives example tests.
  */
class ExpressionPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(7)

  private def randWords(): List[String] =
    List.fill(3 + rnd.nextInt(9))(
      LazyList.continually(rnd.alphanumeric.head).take(1 + rnd.nextInt(8)).mkString)

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  test("NormalizeText: composes NFC, folds marks, leaves non-decomposables") {
    import org.apache.spark.sql.functions._
    def norm(s: String, strip: Boolean): String =
      Seq(Tuple1(s)).toDF("t")
        .select(TextFunctions.normalizeText(col("t"), strip)).as[String].head()
    // decomposed e + U+0301 composes to the single codepoint U+00E9
    assert(norm("Café", strip = false) == "Café")
    assert(norm("Café", strip = false).length == 4)
    // accent fold: precomposed AND decomposed inputs land identically
    assert(norm("Café señor", strip = true) == "Cafe senor")
    assert(norm("Café señor", strip = true) == "Cafe senor")
    // canonical-mark removal only: no transliteration of ø æ ß
    assert(norm("ø æ ß", strip = true) == "ø æ ß")
    // supplementary codepoints survive both paths (codepoint iteration)
    val emoji = new String(Character.toChars(0x1F600))
    assert(norm(s"a${emoji}b", strip = true) == s"a${emoji}b")
    // idempotence on already-normal text
    val ascii = "plain ascii text 123"
    assert(norm(ascii, strip = false) == ascii && norm(ascii, strip = true) == ascii)
  }

  test("MinHashSignature == per-salt min over md5 of k-shingles (random corpora)") {
    for (_ <- 1 to 30) {
      val ws = randWords()
      val expected = (0 until 12).map { k =>
        ws.sliding(3).map(sh => md5hex(s"$k|${sh.mkString(" ")}")).min
      }
      val got = Seq(Tuple1(ws.toArray)).toDF("ws")
        .select(Bridge.column(MinHashSignature(
          Bridge.expression(col("ws")), 12, shingleSize = 3)).as("sig"))
        .as[Seq[String]].head()
      assert(got == expected, s"words: $ws")
    }
  }

  test("ShingleSet == distinct sliding windows in first-occurrence order") {
    for (_ <- 1 to 30) {
      val ws = randWords()
      val expected = ws.sliding(3).map(_.mkString(" ")).toList.distinct
      val got = Seq(Tuple1(ws.toArray)).toDF("ws")
        .select(Bridge.column(ShingleSet(
          Bridge.expression(col("ws")), 3)).as("sh"))
        .as[Seq[String]].head()
      assert(got == expected, s"words: $ws")
    }
  }

  test("SimHash64 == bit-majority reference on random token lists") {
    for (_ <- 1 to 30) {
      val ws = randWords()
      val counts = new Array[Int](64)
      for (w <- ws) {
        val hex = md5hex(w)
        for (i <- 0 until 64) {
          val nib = Integer.parseInt(hex.substring(i / 4, i / 4 + 1), 16)
          if (((nib >> (i % 4)) & 1) == 1) counts(i) += 1
        }
      }
      var expected = 0L
      for (i <- 0 until 64) if (2L * counts(i) > ws.size) expected |= 1L << i
      val got = Seq(Tuple1(ws.toArray)).toDF("ws")
        .select(Bridge.column(SimHash64(Bridge.expression(col("ws")))).as("sh"))
        .as[Long].head()
      assert(got == expected, s"words: $ws")
    }
  }

  test("signature kernels stay inside whole-stage codegen (no fallback projection)") {
    // the dedup signature pass is the highest-volume map projection in the
    // LLM-pipeline path — a CodegenFallback expression expels its ENTIRE
    // projection from WSC, so assert each kernel's projection carries the
    // codegen star (the PqSpec WholeStageCodegen-marker pattern)
    val docs = spark.read.parquet(s"$sf001/documents.parquet").limit(50)
    val words = split(lower(col("text")), "\\s+")
    def assertFused(df: org.apache.spark.sql.DataFrame, kernel: String): Unit = {
      df.collect() // materialize the AQE final plan before reading it
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains(kernel)),
        s"$kernel projection fell out of whole-stage codegen:\n$plan")
    }
    assertFused(docs.select(Bridge.column(MinHashSignature(
      Bridge.expression(words), 12, shingleSize = 3)).as("sig")), "minhash_signature")
    assertFused(docs.select(Bridge.column(ShingleSet(
      Bridge.expression(words), 3)).as("sh")), "shingle_set")
    assertFused(docs.select(Bridge.column(SimHash64(
      Bridge.expression(words))).as("sh")), "simhash64")
    assertFused(docs.select(TextFunctions.normalizeText(col("text"),
      stripAccents = true).as("t")), "normalize_text")
  }

  test("signature kernels: codegen and interpreted eval agree (null/empty edges included)") {
    val docs = Seq(
      "three words here exactly matching shingles",
      "two words", // < shingle size -> minhash NULL, shingle set empty
      "", // empty token edge
      "Café señor naïve façade").toDF("text")
    val words = split(lower(col("text")), "\\s+")
    val exprs = docs.select(
      Bridge.column(MinHashSignature(Bridge.expression(words), 4, 3)).as("mh"),
      Bridge.column(ShingleSet(Bridge.expression(words), 3)).as("sh"),
      Bridge.column(SimHash64(Bridge.expression(words))).as("sim"),
      TextFunctions.normalizeText(col("text"), stripAccents = true).as("nt"))
    val fused = exprs.collect().map(_.toString).toSeq
    val interp = withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      exprs.collect().map(_.toString).toSeq
    }
    assert(fused == interp, "codegen and interpreted kernels diverge")
  }

  private def withSQLConf[A](pairs: (String, String)*)(f: => A): A = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("HyperplaneSignatures == sign-projection reference on random vectors") {
    val tables = Hyperplanes.tables(4, 6, 8, 42L)
    for (_ <- 1 to 30) {
      val v = Array.fill(8)(rnd.nextDouble() * 10.0 - 5.0)
      val expected = tables.map { planes =>
        planes.zipWithIndex.foldLeft(0) { case (sig, (plane, b)) =>
          // identical fold order to the expression: sequential ascending dot
          var dot = 0.0
          var i = 0
          while (i < 8) { dot += v(i) * plane(i); i += 1 }
          if (dot >= 0) sig | (1 << b) else sig
        }
      }.toSeq
      val got = Seq(Tuple1(v)).toDF("v")
        .select(Bridge.column(HyperplaneSignatures(
          Bridge.expression(col("v")), 4, 6, 8, 42L)).as("sigs"))
        .as[Seq[Int]].head()
      assert(got == expected, s"vec: ${v.toSeq}")
    }
  }
}
