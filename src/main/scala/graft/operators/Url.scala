package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL parsing, canonicalization and registered-domain extraction — the
  * web-curation staple that runs before URL-level dedup, per-domain
  * quality weighting, and crawl-frontier bookkeeping (every CommonCrawl-
  * derived pipeline normalizes URLs before anything else touches them).
  *
  * Scale shape: pure regexp/string/array `functions._` — a scan-side
  * projection, no UDFs, no shuffle; at 100 TB the URL never leaves the
  * task that scanned it. Every operation has an exact DuckDB equivalent
  * (RE2-safe patterns, same replace/sort chains), so the whole pipeline is
  * oracle-checkable hash-exact; [[graft.SparkEntry]] gates it with
  * q_url_normalize over an in-plan synthesized URL corpus (the Zipf/HTML
  * synthesis discipline — the driver tables carry no URLs, so the
  * construction is part of the gated plan and the oracle rebuilds it
  * byte-identically).
  *
  * Canonicalization rules (the standard safe-dedup set):
  *   - scheme and host lowercased;
  *   - default ports stripped (http:80, https:443), others kept;
  *   - tracking params dropped (utm_*, fbclid, gclid, msclkid, mc_eid);
  *   - remaining query params sorted bytewise (param ORDER is not
  *     semantic; sorting merges permutations);
  *   - empty path → "/", trailing slash stripped off non-root paths;
  *   - fragment dropped (never sent to the server).
  */
object Url {

  /** RFC-3986-shaped splitter (RE2-safe: no backrefs, no lookarounds).
    * Groups: 1 scheme, 2 authority, 3 path, 4 query (no '?'), 5 fragment.
    */
  val UrlRe: String =
    "^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\\?([^#]*))?(?:#(.*))?$"

  /** Query-param keys dropped during canonicalization. */
  val TrackingParamRe: String = "^(utm_[a-z0-9]+|fbclid|gclid|msclkid|mc_eid)="

  /** Multi-label public suffixes recognized by [[registeredDomain]] —
    * the high-traffic subset of the PSL (the full list is data, not code;
    * production would broadcast it — the RULE is what is gated here).
    */
  val MultiLabelSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp", "co.in", "co.nz", "com.br", "com.mx",
    "com.cn", "com.sg", "co.za", "github.io", "blogspot.com")

  def scheme(url: Column): Column = lower(regexp_extract(url, UrlRe, 1))

  /** Authority minus any userinfo, lowercased, port split off. */
  def hostPort(url: Column): Column =
    lower(regexp_replace(regexp_extract(url, UrlRe, 2), "^[^@]*@", ""))

  def host(url: Column): Column =
    regexp_replace(hostPort(url), ":[0-9]*$", "")

  /** Port as a string ("" when absent) — string grain keeps the oracle
    * comparison exact (no int casts of empty).
    */
  def port(url: Column): Column =
    regexp_extract(hostPort(url), ":([0-9]+)$", 1)

  def rawPath(url: Column): Column = regexp_extract(url, UrlRe, 3)

  def rawQuery(url: Column): Column = regexp_extract(url, UrlRe, 4)

  /** Canonical path: empty → "/", trailing slash stripped off non-root. */
  def canonicalPath(url: Column): Column = {
    val p = rawPath(url)
    when(p === "" || p === "/", lit("/"))
      .otherwise(regexp_replace(p, "/$", ""))
  }

  /** Canonical query: tracking params dropped, the rest sorted bytewise,
    * re-joined with '&' ("" when nothing survives).
    */
  def canonicalQuery(url: Column): Column =
    array_join(
      array_sort(filter(split(rawQuery(url), "&"),
        p => p =!= "" && !p.rlike(TrackingParamRe))),
      "&")

  /** Canonical port suffix (":8080" or "") — default ports stripped. */
  def canonicalPortSuffix(url: Column): Column = {
    val s = scheme(url)
    val p = port(url)
    when(p === "" ||
        (s === "http" && p === "80") || (s === "https" && p === "443"),
      lit("")).otherwise(concat(lit(":"), p))
  }

  /** The full canonical URL (fragment dropped). */
  def canonicalize(url: Column): Column = {
    val q = canonicalQuery(url)
    concat(
      scheme(url), lit("://"), host(url), canonicalPortSuffix(url),
      canonicalPath(url),
      when(q === "", lit("")).otherwise(concat(lit("?"), q)))
  }

  /** Registered domain of a LOWERCASE host: last 3 labels when the host
    * ends in a recognized multi-label public suffix, last 2 otherwise.
    * Hosts are expected to carry ≥ 2 labels (guaranteed for URLs that
    * parsed; bare single-label hosts return themselves).
    */
  def registeredDomain(hostCol: Column): Column = {
    val parts = split(hostCol, "\\.")
    val n = size(parts)
    val isMulti = MultiLabelSuffixes
      .map(sfx => hostCol.endsWith("." + sfx))
      .reduce(_ || _)
    val labels = when(isMulti, lit(3)).otherwise(lit(2))
    when(n <= labels, hostCol)
      .otherwise(array_join(slice(parts, n - labels + 1, labels), "."))
  }

  /** Deterministic messy-URL corpus keyed by an id column — the gate's
    * in-plan synthesis (the driver tables carry no URLs; the Zipf/HTML
    * discipline: the construction is part of the gated plan, rebuilt
    * byte-identically by the oracle). Exercises every canonicalization
    * rule: mixed-case schemes and hosts, default and explicit ports,
    * www/apex hosts across 2-label and multi-label public suffixes, empty
    * and trailing-slash paths, tracking params, permuted param order, and
    * fragments.
    */
  def synthesizeUrl(id: org.apache.spark.sql.Column): Column = {
    val sfx = element_at(
      array(Seq("com", "org", "co.uk", "github.io", "net", "com.au").map(lit): _*),
      pmod(id, lit(6)).cast("int") + 1)
    val host0 = concat(
      when(pmod(id, lit(3)) === 0, lit("www.")).otherwise(lit("")),
      lit("site"), pmod(id, lit(50)).cast("string"), lit("."), sfx)
    val hostC = when(pmod(id, lit(7)) === 0, upper(host0)).otherwise(host0)
    val sch0 = when(pmod(id, lit(2)) === 0, lit("https")).otherwise(lit("http"))
    val schC = when(pmod(id, lit(11)) === 0, upper(sch0)).otherwise(sch0)
    val prt = when(pmod(id, lit(5)) === 0,
        when(sch0 === "https", lit(":443")).otherwise(lit(":80")))
      .when(pmod(id, lit(13)) === 0, lit(":8080"))
      .otherwise(lit(""))
    val m4 = pmod(id, lit(4))
    val art = pmod(id, lit(100)).cast("string")
    val path = when(m4 === 0, lit(""))
      .when(m4 === 1, lit("/"))
      .when(m4 === 2, concat(lit("/articles/"), art))
      .otherwise(concat(lit("/articles/"), art, lit("/")))
    val m3 = pmod(id, lit(3))
    val q = when(m3 === 0, concat(lit("utm_source=feed&b="),
        pmod(id, lit(9)).cast("string"), lit("&a="), pmod(id, lit(5)).cast("string")))
      .when(m3 === 1, concat(lit("a="), pmod(id, lit(5)).cast("string"),
        lit("&utm_campaign=x&gclid=g1")))
      .otherwise(lit(""))
    val frag = when(pmod(id, lit(2)) === 0, lit("#sec")).otherwise(lit(""))
    concat(schC, lit("://"), hostC, prt, path,
      when(q === "", lit("")).otherwise(concat(lit("?"), q)), frag)
  }

  /** Doc-grain URL normalization frame:
    * `(id, url, url_canonical, host, registered_domain, n_params_kept)`.
    */
  def normalize(df: DataFrame, idCol: String, urlCol: String): DataFrame = {
    val u = col(urlCol)
    val q = canonicalQuery(u)
    df.select(col(idCol), u.as("url"),
      canonicalize(u).as("url_canonical"),
      host(u).as("host"),
      registeredDomain(host(u)).as("registered_domain"),
      when(q === "", lit(0L))
        .otherwise(size(split(q, "&")).cast("long")).as("n_params_kept"))
  }

  // ---- DuckDB replay ------------------------------------------------------

  /** CTE chain ending in `urls(doc_id, url)` — byte-identical to
    * [[synthesizeUrl]] over `documents.doc_id`.
    */
  val SynthesizeUrlSql: String =
    """u_parts AS (SELECT doc_id,
      |    concat(
      |      CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END,
      |      'site', CAST(doc_id % 50 AS varchar), '.',
      |      CASE doc_id % 6 WHEN 0 THEN 'com' WHEN 1 THEN 'org'
      |        WHEN 2 THEN 'co.uk' WHEN 3 THEN 'github.io'
      |        WHEN 4 THEN 'net' ELSE 'com.au' END) AS host0,
      |    CASE WHEN doc_id % 2 = 0 THEN 'https' ELSE 'http' END AS sch0
      |  FROM documents),
      |urls AS (SELECT doc_id,
      |    concat(
      |      CASE WHEN doc_id % 11 = 0 THEN upper(sch0) ELSE sch0 END,
      |      '://',
      |      CASE WHEN doc_id % 7 = 0 THEN upper(host0) ELSE host0 END,
      |      CASE WHEN doc_id % 5 = 0
      |        THEN (CASE WHEN sch0 = 'https' THEN ':443' ELSE ':80' END)
      |        WHEN doc_id % 13 = 0 THEN ':8080' ELSE '' END,
      |      CASE doc_id % 4 WHEN 0 THEN '' WHEN 1 THEN '/'
      |        WHEN 2 THEN concat('/articles/', CAST(doc_id % 100 AS varchar))
      |        ELSE concat('/articles/', CAST(doc_id % 100 AS varchar), '/') END,
      |      CASE doc_id % 3
      |        WHEN 0 THEN concat('?utm_source=feed&b=', CAST(doc_id % 9 AS varchar),
      |          '&a=', CAST(doc_id % 5 AS varchar))
      |        WHEN 1 THEN concat('?a=', CAST(doc_id % 5 AS varchar),
      |          '&utm_campaign=x&gclid=g1')
      |        ELSE '' END,
      |      CASE WHEN doc_id % 2 = 0 THEN '#sec' ELSE '' END) AS url
      |  FROM u_parts)""".stripMargin

  /** CTE chain from `urls(doc_id, url)` ending in
    * `urlnorm(doc_id, url, url_canonical, host, registered_domain,
    * n_params_kept)` — the full [[normalize]] replay (same RE2 patterns,
    * same sort/filter chains, same suffix rule).
    */
  lazy val NormalizeSql: String = {
    val multi = MultiLabelSuffixes.map(sfx => s"host LIKE '%.$sfx'").mkString(" OR ")
    s"""upr AS (SELECT doc_id, url,
       |    lower(regexp_extract(url, '$UrlRe', 1)) AS sch,
       |    lower(regexp_replace(regexp_extract(url, '$UrlRe', 2), '^[^@]*@', ''))
       |      AS hostport,
       |    regexp_extract(url, '$UrlRe', 3) AS rawpath,
       |    coalesce(regexp_extract(url, '$UrlRe', 4), '') AS rawq
       |  FROM urls),
       |up2 AS (SELECT *, regexp_replace(hostport, ':[0-9]*$$', '') AS host,
       |    coalesce(regexp_extract(hostport, ':([0-9]+)$$', 1), '') AS prt
       |  FROM upr),
       |uq AS (SELECT *, coalesce(array_to_string(list_sort(list_filter(
       |      string_split(rawq, '&'),
       |      x -> x <> '' AND NOT regexp_matches(x, '$TrackingParamRe'))), '&'), '')
       |    AS cq FROM up2),
       |up3 AS (SELECT *,
       |    CASE WHEN rawpath IN ('', '/') THEN '/'
       |      ELSE regexp_replace(rawpath, '/$$', '') END AS cpath,
       |    CASE WHEN prt = '' OR (sch = 'http' AND prt = '80')
       |        OR (sch = 'https' AND prt = '443')
       |      THEN '' ELSE ':' || prt END AS cport
       |  FROM uq),
       |urd AS (SELECT *, string_split(host, '.') AS sp,
       |    CASE WHEN $multi THEN 3 ELSE 2 END AS lbl FROM up3),
       |urlnorm AS (SELECT doc_id, url,
       |    concat(sch, '://', host, cport, cpath,
       |      CASE WHEN cq = '' THEN '' ELSE '?' || cq END) AS url_canonical,
       |    host,
       |    CASE WHEN len(sp) <= lbl THEN host
       |      ELSE array_to_string(list_slice(sp, len(sp) - lbl + 1, len(sp)), '.')
       |      END AS registered_domain,
       |    CAST(CASE WHEN cq = '' THEN 0
       |      ELSE len(string_split(cq, '&')) END AS bigint) AS n_params_kept
       |  FROM urd)""".stripMargin
  }
}
