package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + host-level rollups — the web-corpus curation
  * step BEFORE text dedup: crawl snapshots carry the same page under
  * scheme/case/port/tracking-param/fragment variants, and domain mixing
  * needs per-host document counts over the CANONICAL identity, not the
  * raw string.
  *
  * Everything here is codegen'd column expressions (regexp + array ops)
  * — map-side, zero shuffles for canonicalization, ONE host-keyed groupBy
  * for the stats. Rules are deterministic and engine-portable (the gate
  * oracle re-derives them in SQL):
  *
  *   1. scheme and host lowercase; fragment (`#...`) dropped
  *   2. default ports stripped (`:80` for http, `:443` for https; any
  *      other port is load-bearing and kept)
  *   3. leading `www.` stripped from the host (corpus-grouping
  *      convention: www and apex serve the same corpus document)
  *   4. tracking params removed (`utm_*`, `gclid`, `fbclid`, `msclkid`,
  *      `ref`), remaining params SORTED by full `k=v` text so param
  *      order never splits one page into two identities
  *   5. trailing slashes stripped from the path (`/a/b/` == `/a/b`)
  */
object UrlOps {

  private val SchemeRe = "^[A-Za-z][A-Za-z0-9+.-]*://"
  private val TrackingRe = "^(utm_[^=]*|gclid|fbclid|msclkid|ref)(=.*)?$"

  private def afterScheme(url: Column): Column =
    regexp_replace(regexp_extract(trim(url), "^([^#?]*)", 1), SchemeRe, "")

  /** Canonical host: lowercase, `www.` and default port stripped. */
  def hostOf(url: Column): Column = {
    val scheme = lower(regexp_extract(trim(url), "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostPort = lower(regexp_extract(afterScheme(url), "^([^/]*)", 1))
    val noWww = regexp_replace(hostPort, "^www\\.", "")
    when(scheme === "http", regexp_replace(noWww, ":80$", ""))
      .when(scheme === "https", regexp_replace(noWww, ":443$", ""))
      .otherwise(noWww)
  }

  /** The full canonical URL under the documented rules. */
  def canonicalUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(trim(url), "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val path = regexp_replace(
      regexp_extract(afterScheme(url), "^[^/]*(.*)$", 1), "/+$", "")
    val query = regexp_extract(trim(url), "^[^#?]*\\?([^#]*)", 1)
    val params = array_join(array_sort(filter(split(query, "&"),
      p => p =!= "" && !p.rlike(TrackingRe))), "&")
    concat(scheme, lit("://"), hostOf(url), path,
      when(params === "", lit("")).otherwise(concat(lit("?"), params)))
  }

  /** Per-row canonicalization: adds `canonical_url` and `host` — pure
    * map-side projection, rides the scan at any scale. */
  def canonicalize(df: DataFrame, urlCol: String): DataFrame =
    df.withColumn("canonical_url", canonicalUrl(col(urlCol)))
      .withColumn("host", hostOf(col(urlCol)))

  /** Host-level corpus stats over canonical identities: document count
    * and DISTINCT canonical URLs per host — the inputs to domain mixing
    * and per-host caps. One host-keyed shuffle; the distinct rides the
    * same aggregation (partial map-side). */
  def hostStats(df: DataFrame, urlCol: String): DataFrame =
    canonicalize(df, urlCol)
      .groupBy(col("host"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("canonical_url")).as("n_urls"))

  /** Per-host document cap — the crawl-curation step that stops a few
    * mega-hosts from dominating a web corpus: keep at most `cap`
    * documents per canonical host, chosen by md5(salt|id) order so the
    * kept subset is reproducible across runs, engines and partitionings
    * (and is not biased toward low ids, which usually encode crawl
    * order).
    *
    * Two shapes, same determinism:
    *  - `exact = true` (default): a host-keyed `row_number` window —
    *    EXACTLY `cap` survivors for any host over the cap. Window width
    *    is one host; a single mega-host (billions of docs) serializes
    *    through one partition, which is where the approximate shape
    *    takes over (the packShards `maxStratumDocs` lesson).
    *  - `exact = false`: per-host census (tiny, broadcast) → map-side
    *    bucket-threshold filter at rate `cap / n` — the corpus never
    *    shuffles and no window runs; survivor counts are binomial around
    *    `cap` (±√cap), the standard trade for mega-host scale.
    */
  def hostCap(df: DataFrame, idCol: String, urlCol: String, cap: Long,
              exact: Boolean = true, salt: String = "hostcap"): DataFrame = {
    require(cap >= 1, s"cap=$cap must be >= 1")
    val canon = canonicalize(df, urlCol)
      .withColumn("_hc_bucket",
        md5(concat(lit(salt + "|"), col(idCol).cast("string"))))
    if (exact) {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("host")).orderBy(col("_hc_bucket"), col(idCol))
      canon.withColumn("host_rank", row_number().over(w))
        .where(col("host_rank") <= cap)
        .drop("_hc_bucket")
    } else {
      val census = df.select(hostOf(col(urlCol)).as("_hc_host"))
        .groupBy(col("_hc_host")).agg(count(lit(1)).as("_hc_n"))
      // rate cap/n through the SHARED CorpusOps threshold encoding ('g' =
      // keep-all when the host is under the cap); the 8-char prefix of
      // _hc_bucket is exactly CorpusOps.bucketOf — the full md5 exists
      // only for the exact path's full-width ordering
      val thr = when(col("_hc_n") <= cap, lit("g"))
        .otherwise(CorpusOps.hexThr(lit(cap) / col("_hc_n")))
      canon
        .join(broadcast(census.withColumn("_hc_thr", thr)
          .select(col("_hc_host"), col("_hc_thr"))),
          col("host") === col("_hc_host"))
        .where(substring(col("_hc_bucket"), 1, 8) < col("_hc_thr"))
        // schema parity with the exact path: the flag changes the
        // algorithm, never the contract — rank is unknowable without the
        // window this path exists to avoid, so it is a typed null
        .withColumn("host_rank", lit(null).cast("int"))
        .drop("_hc_host", "_hc_thr", "_hc_bucket")
    }
  }
}
