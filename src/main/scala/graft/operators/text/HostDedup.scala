package graft.operators.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL/host-keyed exact dedup + per-host caps — the FIRST stage of the
  * standard web-curation recipe (CCNet: dedup within a shard by
  * content hash, then bound any one domain's share before quality
  * filtering ever runs). A crawl re-fetches the same page under many
  * URLs and crawl dates; host-keyed content-hash dedup collapses the
  * re-crawls, and the per-host cap keeps one hot domain from dominating
  * the corpus regardless of its quality scores.
  *
  * 100 TB shape: the decision pipeline is NARROW — (id, host, 16-byte
  * md5, quality) projects out at the scan, so document text never
  * enters either shuffle; two keyed windows ((host, digest) then
  * host), each an ids-width exchange. Callers semi-join the kept ids
  * back to the corpus to materialize. Reuses
  * [[CorpusOps.capPerSource]] for the cap leg (quality DESC, id ASC —
  * the engine-stable ordering contract).
  */
object HostDedup {

  /** Host key of a URL-shaped string: scheme (`xyz://`, any case) or a
    * scheme-relative `//` stripped, userinfo (`user@`) stripped, then
    * either a bracketed IPv6 literal (`[::1]`, kept whole — round-15
    * hardening: the former `[^/?#:]*` cut at the first `:` and keyed
    * every bracketed-IPv6 URL as `[`) or a reg-name cut at the first
    * of `/ ? # :` (path, query, fragment, port); lowercased. One
    * regexp both engines run identically (no backrefs/lookarounds —
    * RE2-safe for the DuckDB oracle; alternation is leftmost-first in
    * both engines, so the bracket arm wins whenever it matches). A
    * bare host without a scheme passes through unchanged; a non-URL
    * string simply keys by itself, which is the right fallback for
    * source-labeled corpora. The scheme arm requires the full `://` —
    * a lone `name:` prefix is NOT treated as a scheme, so bare
    * `host:port` strings still key by host. */
  val HostPattern =
    "^(?:[a-zA-Z][a-zA-Z0-9+.-]*://|//)?(?:[^/?#@]*@)?(\\[[^\\]]*\\]|[^/?#:]*)"

  def hostOf(url: Column): Column =
    lower(regexp_extract(url, HostPattern, 1))

  /** SQL twin of [[hostOf]] over a DuckDB expression. */
  def hostOfSql(urlRef: String): String =
    s"lower(regexp_extract($urlRef, '$HostPattern', 1))"

  /** Stage 1+2 over a crawl-shaped frame: exact-dedup by
    * (host, md5(content)) keeping the LOWEST id of each duplicate
    * group (the first crawl wins — deterministic and join-free), then
    * cap surviving docs per host at `cap`, keeping the best `quality`
    * (id tiebreak). Returns the NARROW decision frame
    * (idCol, host, rank, keep) — the quality column is consumed by the
    * ranking and dropped; text never moves. Semi-join `keep` ids back
    * to the corpus to materialize. */
  def dedupAndCap(
      df: DataFrame,
      url: Column,
      content: Column,
      idCol: String,
      quality: Column,
      cap: Int): DataFrame = {
    val narrow = df.select(
      col(idCol), hostOf(url).as("host"), md5(content).as("__digest"),
      quality.as("__q"))
    val dupW = Window.partitionBy(col("host"), col("__digest"))
      .orderBy(col(idCol).asc)
    val uniq = narrow
      .withColumn("__rn", row_number().over(dupW))
      .where(col("__rn") === 1)
      .select(col(idCol), col("host"), col("__q"))
    CorpusOps.capPerSource(uniq, "host", col("__q"), idCol, cap)
      .drop("__q")
  }
}
