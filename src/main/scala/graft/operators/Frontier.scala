package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Crawl FRONTIER scheduling — the last step between "crawl operators"
  * and "a crawl plan": given the canonicalized, robots-filtered URL set
  * with a priority signal, decide WHAT to fetch WHEN without hammering
  * any single host. Composes [[graft.functions.UrlCanon]] (identity),
  * [[graft.functions.Robots]] (admission) and this scheduler (ordering).
  *
  * Model (the standard Mercator/Heritrix frontier split, public
  * literature — Najork & Heydon 2001):
  *  - DEDUP: canonical URL identity; among duplicates the MAX-priority
  *    row survives (ties: lexicographically first source), so a page
  *    discovered from many places is fetched once at its best priority.
  *  - POLITENESS: per host, at most ONE fetch per `crawlDelaySec`
  *    window. Slots are per-host ranks (priority desc, url asc) and
  *    `fetch_at_sec = slot * crawlDelaySec` — wave k across all hosts
  *    fetches each host's k-th URL, so the per-host rate invariant holds
  *    BY CONSTRUCTION regardless of executor count or layout.
  *  - BUDGET: `maxPerHost` truncates each host's queue at the low-
  *    priority tail (crawl-trap / infinite-calendar defense).
  *
  * Scale: one shuffle, hash-partitioned on host — the same partitioning
  * a fetch fleet wants (each executor owns whole hosts, politeness
  * enforceable locally). The rank window is per-host state only; giant
  * hosts are bounded by `maxPerHost` before any sort amplification
  * (filter on row_number, no global sort). At 100 TB the frontier is a
  * maintained table: re-scheduling is one idempotent pass over
  * (host, pending) partitions.
  */
object Frontier {

  /** Schedule a URL frame: `urlCol` (pre- or post-canonical — it is
    * canonicalized here either way), `priorityCol` (higher fetches
    * earlier). Returns one row per KEPT canonical URL:
    * `(host, url, priority, slot, fetch_at_sec, n_discovered)` with
    * `slot` the 0-based per-host fetch rank and `n_discovered` how many
    * input rows collapsed into this canonical URL.
    */
  def schedule(urls: DataFrame, urlCol: String, priorityCol: String,
               crawlDelaySec: Double = 1.0,
               maxPerHost: Int = 1000): DataFrame = {
    require(crawlDelaySec > 0, s"crawlDelaySec must be > 0, got $crawlDelaySec")
    require(maxPerHost >= 1, s"maxPerHost must be >= 1, got $maxPerHost")
    val canon = graft.functions.UrlCanon.url_canon(col(urlCol))
    val hosted = urls
      .select(canon.as("url"),
        col(priorityCol).cast("double").as("priority"))
      .select(hostOf(col("url")).as("host"), col("url"), col("priority"))
      .filter(col("host").isNotNull && length(col("host")) > 0)
    // canonical-URL dedup: max priority wins (a page found from many
    // sources fetches once, at its best priority)
    val deduped = hosted
      .groupBy(col("host"), col("url"))
      .agg(max(col("priority")).as("priority"),
        count(lit(1)).as("n_discovered"))
    // per-host politeness rank; deterministic tiebreak on the url
    val w = Window.partitionBy(col("host"))
      .orderBy(col("priority").desc, col("url").asc)
    deduped
      .withColumn("slot", row_number().over(w).cast("long") - 1L)
      .filter(col("slot") < maxPerHost)
      .withColumn("fetch_at_sec",
        round(col("slot").cast("double") * lit(crawlDelaySec), 6))
      .select(col("host"), col("url"), col("priority"), col("slot"),
        col("fetch_at_sec"), col("n_discovered"))
  }

  /** Host (lowercased authority minus userinfo and port) of a CANONICAL
    * URL; null/empty when the string has no "://" authority. Pure column
    * expression — stays in whole-stage codegen.
    */
  def hostOf(url: Column): Column = {
    val afterScheme = substring_index(url, "://", -1)
    val authority = substring_index(afterScheme, "/", 1)
    val noUser = when(authority.contains("@"),
      substring_index(authority, "@", -1)).otherwise(authority)
    val noPort = when(noUser.contains(":"),
      substring_index(noUser, ":", 1)).otherwise(noUser)
    when(url.contains("://"), lower(noPort))
  }
}
