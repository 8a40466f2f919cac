package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the key extractor for URL-keyed corpus dedup
  * (crawl pipelines dedup by canonical URL before any content pass:
  * the same page arrives under http/https, with and without `www.`,
  * with tracking params, fragments, default ports, duplicate or
  * trailing slashes). One canonical form per page turns that into one
  * exact groupBy key.
  *
  * Everything here is a chain of built-in string/array expressions —
  * codegen'd, narrow, zero shuffles: at 100 TB the canonicalization is
  * a free map stage and the dedup cost is the single groupBy on the
  * canonical key. The regexes stay inside the RE2∩Java portable subset
  * (the ta_pii_audit rule) so a SQL oracle replays them verbatim.
  *
  * Rules (applied in order):
  *   1. trim; strip the `#fragment`;
  *   2. lowercase the scheme and host (ONLY those — paths are
  *      case-sensitive per RFC 3986);
  *   3. drop a leading `www.` and a default port (`:80` on http,
  *      `:443` on https; non-default ports survive);
  *   4. collapse duplicate slashes in the path, drop a trailing slash
  *      (an empty path becomes `/`);
  *   5. drop tracking query params (`utm_*`, `gclid`, `fbclid`,
  *      `msclkid`), sort the survivors (param order is almost never
  *      semantic; sorting merges permuted duplicates), drop the `?`
  *      when none survive.
  *
  * Non-absolute inputs (no `scheme://`) canonicalize to NULL — a loud
  * sentinel the caller can count, not a silently passed-through
  * garbage key. */
object Urls {

  private val TrackingRe = "^(utm_[A-Za-z0-9_]*|gclid|fbclid|msclkid)="

  def canonicalUrl(url: Column): Column = {
    val u = regexp_replace(trim(url), "#.*$", "")
    val scheme = lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostRaw = lower(regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?]*)", 1))
    val hostNoWww = regexp_replace(hostRaw, "^www\\.", "")
    val host = when(scheme === "http", regexp_replace(hostNoWww, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostNoWww, ":443$", ""))
      .otherwise(hostNoWww)
    val pathRaw = regexp_replace(
      regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*([^?]*)", 1),
      "/{2,}", "/")
    val path = when(pathRaw === "" || pathRaw === "/", lit("/"))
      .otherwise(regexp_replace(pathRaw, "/$", ""))
    val kept = array_sort(filter(split(regexp_extract(u, "\\?(.*)$", 1), "&"),
      x => x =!= "" && !x.rlike(TrackingRe)))
    val base = concat(scheme, lit("://"), host, path)
    when(scheme === "", lit(null).cast("string"))
      .when(size(kept) > 0, concat(base, lit("?"), array_join(kept, "&")))
      .otherwise(base)
  }

  /** The DuckDB twin of [[canonicalUrl]] over a SQL expression `e` —
    * kept NEXT TO the Column form so the two cannot drift apart (the
    * shared-canonSql lesson). DuckDB's regexp_replace is first-match
    * unless given the 'g' flag; Spark's replaces all — the one dialect
    * difference, pinned here. */
  def canonicalUrlSql(e: String): String = {
    val u = s"regexp_replace(trim($e), '#.*$$', '')"
    val scheme = s"lower(regexp_extract($u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    val hostNoWww =
      s"regexp_replace(lower(regexp_extract($u, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?]*)', 1)), '^www\\.', '')"
    val host =
      s"""CASE WHEN $scheme = 'http' THEN regexp_replace($hostNoWww, ':80$$', '')
               WHEN $scheme = 'https' THEN regexp_replace($hostNoWww, ':443$$', '')
               ELSE $hostNoWww END"""
    val pathRaw =
      s"regexp_replace(regexp_extract($u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*([^?]*)', 1), '/{2,}', '/', 'g')"
    val path =
      s"""CASE WHEN $pathRaw IN ('', '/') THEN '/'
               ELSE regexp_replace($pathRaw, '/$$', '') END"""
    val kept =
      s"""list_sort(list_filter(str_split(regexp_extract($u, '\\?(.*)$$', 1), '&'),
            x -> x <> '' AND NOT regexp_matches(x, '$TrackingRe')))"""
    s"""CASE WHEN $scheme = '' THEN NULL
             WHEN len($kept) > 0
               THEN concat($scheme, '://', $host, $path, '?', array_to_string($kept, '&'))
             ELSE concat($scheme, '://', $host, $path) END"""
  }
}
