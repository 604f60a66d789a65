package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the normalization pass a web-scale corpus runs
  * before URL-keyed dedup and domain accounting (the reference keys
  * samples by `__url__` but never normalizes it; at crawl scale the same
  * page arrives under case-variant hosts, tracking parameters, fragments
  * and default ports, and an un-canonicalized key under-merges).
  *
  * Everything is a chain of codegen'd `regexp_replace`/`regexp_extract`
  * built-ins in the RE2 ∩ java.util.regex common subset (no
  * backreferences in patterns, no lookaround), so the SAME canonical
  * form is computable by the DuckDB oracle ([[canonicalizeUrlSql]]) and
  * the whole kernel stays inside one WholeStageCodegen pass over the
  * scan — per-row string work, embarrassingly parallel at any scale.
  *
  * Canonical form:
  *  1. scheme and authority (up to the first `/?#`) lowercased — path,
  *     query and fragment keep their case (per RFC 3986 §6.2.2.1 only
  *     scheme+host are case-insensitive);
  *  2. fragment dropped;
  *  3. `utm_*` tracking parameters dropped, separators repaired (a
  *     leading `?` survives only if a non-utm parameter remains);
  *  4. default ports `:80`/`:443` dropped;
  *  5. trailing slash dropped (a bare-root slash collapses with the
  *     host under rule 5's [^/] guard only when preceded by a non-slash
  *     char, so `https://h/` → `https://h`).
  */
object UrlFunctions {

  private val AuthorityRe = "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)"

  def canonicalizeUrl(c: Column): Column = {
    // rule 1: lowercase scheme+authority, splice the untouched rest back
    val auth = lower(regexp_extract(c, AuthorityRe, 1))
    val rest = regexp_replace(c, AuthorityRe, "")
    val x1 = concat(auth, rest)
    val x2 = regexp_replace(x1, "#.*$", "") // rule 2: fragment
    // rule 3: utm params — "followed by more params" then "last param"
    val x3 = regexp_replace(x2, "utm_[a-z]+=[^&#]*&", "")
    val x4 = regexp_replace(x3, "[?&]utm_[a-z]+=[^&#]*$", "")
    // rule 4: default port (authority is lowercase by now)
    val x5 = regexp_replace(x4, ":(80|443)([/?]|$)", "$2")
    // rule 5: trailing slash
    regexp_replace(x5, "([^/])/$", "$1")
  }

  /** JVM twin of [[canonicalizeUrl]] for the SQL surface
    * (`graft_url_canonical`) — same regex chain over java.util.regex,
    * Locale.ROOT lowercasing (matches Spark's `lower` on the
    * scheme/host charset, which RFC 3986 restricts to ASCII).
    */
  def canonicalizeUrlJvm(u: String): String = {
    if (u == null) return null
    val m = java.util.regex.Pattern.compile(AuthorityRe).matcher(u)
    val x1 =
      if (m.find()) m.group(1).toLowerCase(java.util.Locale.ROOT) + u.substring(m.end())
      else u
    x1.replaceAll("#.*$", "")
      .replaceAll("utm_[a-z]+=[^&#]*&", "")
      .replaceAll("[?&]utm_[a-z]+=[^&#]*$", "")
      .replaceAll(":(80|443)([/?]|$)", "$2")
      .replaceAll("([^/])/$", "$1")
  }

  /** DuckDB-dialect rendering of [[canonicalizeUrl]] — same regexes;
    * replacement backrefs are `\\1` there vs Java's `$1`, and DuckDB
    * needs an explicit 'g' flag where Spark always replaces all (only
    * the multi-utm rule can match more than once in a URL).
    */
  def canonicalizeUrlSql(e: String): String = {
    val spliced = s"(lower(regexp_extract($e, '$AuthorityRe', 1)) || " +
      s"regexp_replace($e, '$AuthorityRe', ''))"
    val noFrag = s"regexp_replace($spliced, '#.*$$', '')"
    val noUtmMid = s"regexp_replace($noFrag, 'utm_[a-z]+=[^&#]*&', '', 'g')"
    val noUtm = s"regexp_replace($noUtmMid, '[?&]utm_[a-z]+=[^&#]*$$', '')"
    val noPort = s"regexp_replace($noUtm, ':(80|443)([/?]|$$)', '\\2')"
    s"regexp_replace($noPort, '([^/])/$$', '\\1')"
  }
}
