package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL canonicalization + URL-level dedup — the first dedup stage of every
  * web-scale corpus pipeline (CommonCrawl dedups by canonical URL before
  * any content hashing; cf. the public CCNet/C4/RefinedWeb pipelines).
  *
  * The canonicalizer is pure regexp/array column algebra (no UDF, no JVM
  * URI parser — java.net.URI semantics are NOT reproducible in a SQL
  * engine, so every step here is a regex both engines run identically):
  * lowercase scheme+host, drop the fragment, strip default ports and a
  * leading `www.`, strip trailing path slashes, drop tracking parameters
  * (`utm_*`, `fbclid`, `gclid`, `ref`), and sort the surviving query
  * parameters for order-independence.
  *
  * Scale shape: canonicalization is a narrow map; the dedup is one
  * hash-partitioned window by canonical URL (equivalently a groupBy) —
  * linear, no joins, skew bounded by the most-duplicated URL.
  */
object UrlOps {

  private val TrackingParam = "^(utm_[^=]*|fbclid|gclid|ref)="

  /** Canonical form of a URL column. Inputs without a `scheme://` prefix
    * canonicalize to a degenerate `://`-headed string rather than NULL —
    * callers filter invalid rows by their own rules first.
    */
  def canonicalize(url: Column): Column = {
    val nofrag = regexp_extract(url, "^([^#]*)", 1)
    val scheme = lower(regexp_extract(nofrag, "^([^:/?#]+)://", 1))
    val hostport = lower(regexp_extract(nofrag, "^[^:/?#]+://([^/?#]*)", 1))
    val host = regexp_replace(
      regexp_replace(hostport, ":(80|443)$", ""), "^www\\.", "")
    val path = regexp_replace(
      regexp_extract(nofrag, "^[^:/?#]+://[^/?#]*([^?#]*)", 1), "/+$", "")
    val rawq = regexp_extract(nofrag, "\\?(.*)$", 1)
    val params = filter(split(rawq, "&"),
      p => p =!= "" && !p.rlike(TrackingParam))
    val q = array_join(array_sort(params), "&")
    concat(scheme, lit("://"), host, path,
      when(q === "", "").otherwise(concat(lit("?"), q)))
  }

  /** URL-level dedup: rank each row within its canonical-URL group by
    * `idCol` (ascending — first-crawled wins under monotone ids) and flag
    * the winner. Returns the input plus (canonical_url, url_rank, is_kept).
    */
  def dedupByUrl(df: DataFrame, idCol: String, urlCol: String): DataFrame = {
    val w = Window.partitionBy("canonical_url").orderBy(col(idCol))
    df.withColumn("canonical_url", canonicalize(col(urlCol)))
      .withColumn("url_rank", row_number().over(w).cast("int"))
      .withColumn("is_kept", (col("url_rank") === 1).cast("int"))
  }
}
