package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  test("fit separates a linearly separable set; same sample -> same model") {
    // y = 1 iff f1 + f2 > 1, with margin — trivially separable
    val rnd = new scala.util.Random(7)
    val rows = (0 until 400).map { i =>
      val (f1, f2) = (rnd.nextDouble(), rnd.nextDouble())
      val label = f1 + f2 > 1.0
      (i.toLong, f1, f2, if (label) f1 + f2 + 0.2 else f1 + f2 - 0.2, label)
    }
    val df = rows.toDF("id", "f1", "f2", "f3", "label")
    val m = QualityClassifier.fit(df, "id", Seq("f1", "f2"), "label")
    val scored = QualityClassifier.score(df, m)
      .select(col("label"), (col("lr_quality") > 0.5).as("pred"))
      .as[(Boolean, Boolean)].collect()
    val acc = scored.count(r => r._1 == r._2).toDouble / scored.length
    assert(acc >= 0.95, s"accuracy $acc")
    val m2 = QualityClassifier.fit(df, "id", Seq("f1", "f2"), "label")
    assert(m2 == m.copy(means = m2.means, stds = m2.stds, weights = m2.weights) &&
      m2.weights.toSeq == m.weights.toSeq && m2.bias == m.bias &&
      m2.means.toSeq == m.means.toSeq && m2.stds.toSeq == m.stds.toSeq,
      "fit must be deterministic")
  }

  test("scoreCol == hand-computed sigmoid; null features impute to the mean") {
    val m = QualityClassifier.Model(Seq("a", "b"),
      means = Array(2.0, 10.0), stds = Array(1.0, 5.0),
      weights = Array(1.5, -0.5), bias = 0.25)
    val df = Seq((1L, Some(3.0), Some(20.0)), (2L, None, Some(10.0)))
      .toDF("id", "a", "b")
    val out = QualityClassifier.score(df, m).select("id", "lr_quality")
      .as[(Long, Double)].collect().toMap
    def sig(z: Double) = 1.0 / (1.0 + math.exp(-z))
    // row 1: z = 0.25 + 1.5*(3-2)/1 - 0.5*(20-10)/5 = 0.25 + 1.5 - 1.0
    assert(math.abs(out(1L) - sig(0.75)) < 1e-15)
    // row 2: null a -> standardized 0; b at mean -> 0
    assert(math.abs(out(2L) - sig(0.25)) < 1e-15)
  }

  test("reference-text vs junk: quality signals + fit = a working filter") {
    // the operator's actual job: score "does this look like reference
    // text". Good docs are stopword-rich English prose; junk is symbol
    // soup and digit runs — exactly what the shape signals encode.
    val rnd = new scala.util.Random(13)
    val good = (0 until 120).map { i =>
      (i.toLong, s"the cat and the dog is in a house of wonder it runs to " +
        s"town ${rnd.nextInt(100)} and rests", 1.0)
    }
    val junk = (0 until 120).map { i =>
      ((i + 1000).toLong,
        (0 until 12).map(_ => rnd.nextInt(4) match {
          case 0 => "###"
          case 1 => rnd.nextInt(100000).toString
          case 2 => "@@@!!"
          case _ => "zxqv"
        }).mkString(" "), 0.0)
    }
    val docs = (good ++ junk).toDF("doc_id", "text", "label")
    val feats = TextAnalysis.quality(docs, "text")
    val cols = Seq("n_words", "avg_word_len", "alpha_ratio", "punct_ratio",
      "stopword_ratio")
    // fit on the first half (id order interleaves good/junk by id ranges;
    // cap to 120 rows = all good? no — ids interleave 0..119 and 1000..;
    // order is 0..119 then 1000.. so cap at full set for a clean split)
    val m = QualityClassifier.fit(feats, "doc_id", cols, "label")
    val scored = QualityClassifier.score(feats, m)
      .select((col("label") === 1.0).as("y"), (col("lr_quality") > 0.5).as("p"))
      .as[(Boolean, Boolean)].collect()
    val acc = scored.count(r => r._1 == r._2).toDouble / scored.length
    assert(acc >= 0.98, s"reference-vs-junk accuracy $acc")
  }
}
