package graft.operators

import graft.SparkSpec

class UrlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[(String, String)] = {
    val df = urls.zipWithIndex.map { case (u, i) => (i.toLong, u) }.toDF("id", "url")
    UrlOps.canonicalize(df, "url").orderBy("id")
      .select("canonical_url", "host").as[(String, String)].collect().toSeq
  }

  test("canonicalization rules, case by case") {
    val out = canon(
      "HTTP://WWW.Example.COM:80/Path/?utm_source=x&b=2&a=1#frag",
      "https://site.org:8443/a//",            // non-default port kept
      "http://host.net/?utm_a=1&utm_b=2",     // tracking-only query drops the '?'
      "https://example.com",                  // bare host
      "http://example.com/A/B?ref=nav&id=7",  // path case preserved, ref dropped
      "https://www.x.io:443/p?b=2&a=1&a=0")   // full k=v sort: a=0 < a=1 < b=2
    assert(out(0) == (("http://example.com/Path?a=1&b=2", "example.com")))
    assert(out(1) == (("https://site.org:8443/a", "site.org:8443")))
    assert(out(2) == (("http://host.net", "host.net")))
    assert(out(3) == (("https://example.com", "example.com")))
    assert(out(4) == (("http://example.com/A/B?id=7", "example.com")))
    assert(out(5) == (("https://x.io/p?a=0&a=1&b=2", "x.io")))
  }

  test("hostCap exact: cap survivors per over-cap host, under-cap hosts intact") {
    val df = (0L until 100L).map(i =>
        (i, if (i < 90) s"http://big.com/p/$i" else s"http://small.org/p/$i"))
      .toDF("id", "url")
    val out = UrlOps.hostCap(df, "id", "url", cap = 10)
      .select("id", "host").as[(Long, String)].collect().toSeq
    assert(out.count(_._2 == "big.com") == 10)
    assert(out.count(_._2 == "small.org") == 10) // under cap: all 10 kept
    // deterministic: same subset both runs
    val again = UrlOps.hostCap(df, "id", "url", cap = 10)
      .select("id").as[Long].collect().toSet
    assert(again == out.map(_._1).toSet)
    // md5 order, not id order — the kept set is not just ids 0..9
    assert(out.filter(_._2 == "big.com").map(_._1).toSet != (0L until 10L).toSet)
  }

  test("hostCap approximate: map-side, ~cap survivors, no window in the plan") {
    val df = (0L until 2000L).map(i => (i, s"http://big.com/p/$i"))
      .toDF("id", "url")
    val out = UrlOps.hostCap(df, "id", "url", cap = 200, exact = false)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("window"),
      s"approximate path must not run a window:\n$plan")
    // the exact flag changes the algorithm, never the schema: a pipeline
    // migrating to the approximate shape at mega-host scale must not
    // break on a missing host_rank (it is a typed null here)
    val exactCols = UrlOps.hostCap(df, "id", "url", cap = 200).columns.toSeq
    assert(out.columns.toSeq.sorted == exactCols.sorted,
      s"schema diverged: ${out.columns.toSeq} vs $exactCols")
    assert(out.select("host_rank").distinct().collect().map(_.isNullAt(0)).toSeq
      == Seq(true))
    val n = out.count()
    // binomial around cap: 200 +- 5 sigma (sigma ~ sqrt(200*0.9) ~ 13.4)
    assert(n > 130 && n < 270, s"survivors $n not near cap 200")
    // under-cap host keeps everything exactly ('g' threshold)
    val small = (0L until 50L).map(i => (i, s"http://small.org/p/$i")).toDF("id", "url")
    assert(UrlOps.hostCap(small, "id", "url", cap = 200, exact = false).count() == 50)
  }

  test("hostStats counts docs and DISTINCT canonical identities per host") {
    val df = Seq(
      (1L, "http://www.a.com/x?utm_s=1"),
      (2L, "HTTP://A.COM:80/x"),          // same canonical as 1
      (3L, "http://a.com/y"),
      (4L, "https://b.org/")
    ).toDF("id", "url")
    val stats = UrlOps.hostStats(df, "url").orderBy("host")
      .as[(String, Long, Long)].collect().toSeq
    assert(stats == Seq(("a.com", 3L, 2L), ("b.org", 1L, 1L)))
  }
}
