package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL normalization + registrable-domain extraction as codegen'd
  * Columns — the curation keys per-domain caps (q56/q190) and mixture
  * weights (q114) hang off when the corpus is a crawl. Built ONLY from
  * codegen'd built-ins (regexp_extract/replace, split, array_sort),
  * each with a line-for-line DuckDB transcription so the operators
  * stay oracle-checkable (SURVEY.md §5).
  *
  * Normalization rules (the conservative, loss-free subset):
  *   - scheme and host lowercased (path/query case is significant and
  *     kept);
  *   - fragment stripped;
  *   - default port stripped (`:80` for http, `:443` for https; any
  *     other port kept);
  *   - leading `www.` stripped from the host;
  *   - trailing slashes stripped from the path;
  *   - query parameters sorted byte-wise (ASCII) on the full `k=v`
  *     token.
  *
  * Deliberately out of scope (documented, left as-is): percent-encoding
  * canonicalization, punycode (IDN) decoding — `xn--…` labels pass
  * through lowercased — and userinfo. IP-literal hosts are preserved
  * verbatim by [[registrableDomain]].
  *
  * Expects absolute `scheme://…` URLs; a non-matching string passes
  * through lowercase-trimmed (regexp_extract returns '' on no match in
  * both engines for these patterns, so the rebuild would be empty —
  * the guard keeps the operator total).
  */
object Urls {

  /** Parse pattern: (1) scheme, (2) authority, (3) path, (4) query. */
  private val P = "^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)[?]?([^#]*)"

  /** DuckDB fragment builders (kept in lockstep with the Columns). */
  def sqlScheme(u: String): String = s"lower(regexp_extract($u, '$P', 1))"
  def sqlAuth(u: String): String = s"lower(regexp_extract($u, '$P', 2))"
  def sqlPath(u: String): String =
    s"regexp_replace(regexp_extract($u, '$P', 3), '/+$$', '')"
  def sqlQuery(u: String): String = s"regexp_extract($u, '$P', 4)"

  /** Normalized URL per the rules above. */
  def normalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, P, 1))
    val auth = lower(regexp_extract(url, P, 2))
    val host = regexp_replace(regexp_replace(auth, ":[0-9]+$", ""),
      "^www\\.", "")
    val port = regexp_extract(auth, ":([0-9]+)$", 1)
    val normPort = when(
      port === "" ||
        (scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"), "")
      .otherwise(concat(lit(":"), port))
    val path = regexp_replace(regexp_extract(url, P, 3), "/+$", "")
    val q = regexp_extract(url, P, 4)
    val normQ = when(q === "", "")
      .otherwise(concat(lit("?"), array_join(array_sort(split(q, "&")), "&")))
    when(scheme =!= "",
      concat(scheme, lit("://"), host, normPort, path, normQ))
      .otherwise(lower(trim(url)))
  }

  /** The DuckDB transcription of [[normalizeUrl]] over expression `u`.
    * Same regexes, same CASE structure; DuckDB list_sort is byte-wise
    * ASC like Spark's array_sort on ASCII.
    */
  def sqlNormalizeUrl(u: String): String = {
    val scheme = sqlScheme(u)
    val auth = sqlAuth(u)
    val host =
      s"regexp_replace(regexp_replace($auth, ':[0-9]+$$', ''), '^www\\.', '')"
    val port = s"regexp_extract($auth, ':([0-9]+)$$', 1)"
    val normPort = s"""(CASE WHEN $port = ''
         OR ($scheme = 'http' AND $port = '80')
         OR ($scheme = 'https' AND $port = '443') THEN ''
        ELSE ':' || $port END)"""
    val path = sqlPath(u)
    val q = sqlQuery(u)
    val normQ = s"""(CASE WHEN $q = '' THEN ''
        ELSE '?' || array_to_string(list_sort(string_split($q, '&')), '&')
        END)"""
    s"""(CASE WHEN $scheme <> ''
        THEN $scheme || '://' || $host || $normPort || $path || $normQ
        ELSE lower(trim($u)) END)"""
  }

  /** Host (authority minus any port) of a normalized URL. */
  def hostOf(urlNorm: Column): Column =
    regexp_extract(urlNorm, "^[a-z0-9+.-]+://([^/:?#]*)", 1)

  def sqlHostOf(u: String): String =
    s"regexp_extract($u, '^[a-z0-9+.-]+://([^/:?#]*)', 1)"

  /** Second-level labels under which a 2-letter country TLD usually
    * delegates registrations (co.uk, com.au, ac.jp, ...) — the
    * heuristic core of public-suffix matching without shipping the
    * full list.
    */
  private val SecondLevel = Seq("co", "com", "net", "org", "gov", "ac", "edu")

  /** Registrable-domain heuristic: the suffix a crawl should cap or
    * mix on. IP literals return verbatim; `a.b.site.co.uk` returns
    * `site.co.uk` (3 labels when the 2nd-to-last label is a known
    * second-level registry under a 2-letter TLD); everything else
    * returns the last two labels. Punycode labels are matched as-is.
    */
  def registrableDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    val isIp = host.rlike("^[0-9.]+$")
    when(isIp || n <= 2, host)
      .when(
        element_at(labels, -2).isin(SecondLevel: _*) &&
          length(element_at(labels, -1)) === 2,
        concat_ws(".", element_at(labels, -3), element_at(labels, -2),
          element_at(labels, -1)))
      .otherwise(concat_ws(".", element_at(labels, -2),
        element_at(labels, -1)))
  }

  /** DuckDB transcription of [[registrableDomain]] over `h`. */
  def sqlRegistrableDomain(h: String): String = {
    val sl = SecondLevel.map(s => s"'$s'").mkString(", ")
    s"""(CASE
        WHEN regexp_matches($h, '^[0-9.]+$$')
          OR len(string_split($h, '.')) <= 2 THEN $h
        WHEN string_split($h, '.')[-2] IN ($sl)
          AND len(string_split($h, '.')[-1]) = 2
        THEN string_split($h, '.')[-3] || '.' ||
             string_split($h, '.')[-2] || '.' || string_split($h, '.')[-1]
        ELSE string_split($h, '.')[-2] || '.' || string_split($h, '.')[-1]
        END)"""
  }
}
