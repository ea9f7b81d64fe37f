package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Deterministic md5-bucket sampling ([[Sampling]]): the properties
  * `rand()` cannot give — reproducibility, nestedness, per-stratum
  * rate control, exact-n takes — each asserted on real keys. */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ids = (0L until 4000L).toDF("id")
    .withColumn("grp", (col("id") % 4).cast("string"))

  test("hashSample: deterministic, nested across rates, rate-accurate") {
    val s10a = Sampling.hashSample(ids, "id", 0.10).as[(Long, String)].collect().toSet
    val s10b = Sampling.hashSample(ids, "id", 0.10).as[(Long, String)].collect().toSet
    assert(s10a == s10b, "same rate, same keys → same member set")
    val s30 = Sampling.hashSample(ids, "id", 0.30).as[(Long, String)].collect().toSet
    assert(s10a.subsetOf(s30), "growing the rate must only ADD members")
    // md5 buckets are uniform: 4000 draws at p=0.1 → ±4σ ≈ ±76
    assert(math.abs(s10a.size - 400) <= 80, s"rate drift: ${s10a.size}/4000 at 0.1")
    assert(Sampling.hashSample(ids, "id", 0.0).isEmpty)
    assert(Sampling.hashSample(ids, "id", 1.0).count() == 4000)
  }

  test("stratified: per-stratum rates, unlisted strata at the default") {
    val s = Sampling.stratified(ids, "id", "grp",
      Map("0" -> 0.0, "1" -> 1.0), defaultRate = 0.5)
    val byGrp = s.groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(!byGrp.contains("0"), "rate-0 stratum must vanish")
    assert(byGrp("1") == 1000L, "rate-1 stratum must survive whole")
    for (g <- Seq("2", "3"))
      assert(math.abs(byGrp(g) - 500) <= 70, s"grp $g: ${byGrp(g)}/1000 at 0.5")
    // stratum membership == hashSample at that stratum's rate (same selector)
    val half = Sampling.hashSample(ids.where(col("grp") === "2"), "id", 0.5)
      .as[(Long, String)].collect().toSet
    val strat2 = s.where(col("grp") === "2").as[(Long, String)].collect().toSet
    assert(strat2 == half)
  }

  test("takePerStratum: exact n, deterministic, nested in the larger take") {
    val t25 = Sampling.takePerStratum(ids, "id", "grp", 25)
      .as[(Long, String)].collect()
    assert(t25.length == 100 &&
      t25.groupBy(_._2).values.forall(_.length == 25))
    val t50 = Sampling.takePerStratum(ids, "id", "grp", 50)
      .as[(Long, String)].collect().toSet
    assert(t25.toSet.subsetOf(t50), "take(25) must be a prefix of take(50)")
    val again = Sampling.takePerStratum(ids, "id", "grp", 25)
      .as[(Long, String)].collect()
    assert(t25.sorted.toSeq == again.sorted.toSeq)
    // a stratum smaller than n returns whole, not padded
    val tiny = Sampling.takePerStratum(
      ids.where(col("id") < 3), "id", "grp", 25)
    assert(tiny.count() == 3)
  }
}
