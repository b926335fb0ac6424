package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL → registrable-domain canonicalization — the glue between a raw crawl
  * (which has URLs) and the domain-keyed balancing operators
  * ([[Curation.blocklistFilter]] / [[Curation.domainCap]] /
  * [[Curation.sqrtTemperatureAllocation]]), which consume a clean domain
  * column. RefinedWeb §3.1 and Dolma both key their caps and blocklists by
  * the REGISTRABLE domain (example.co.uk, not cdn.assets.example.co.uk),
  * because subdomain-keyed caps are trivially gamed by wildcard DNS.
  *
  * Reference scope analog: the reference has no URL functions at all (its
  * surface is Hive DML over keyed tables); this operator is part of the
  * training-data surface layered on top.
  *
  * Scale shape: every function here is a narrow per-row projection —
  * `parse_url` + `split` + `slice` are codegen'd string/array ops, zero
  * shuffle at any corpus size. The suffix set is a literal in the plan
  * (constant code size), never a join.
  */
object Urls {

  /** Two-label public suffixes under which a registrable domain has THREE
    * labels (example.co.uk). A documented, deliberately small bundled
    * subset of the Mozilla Public Suffix List covering the highest-volume
    * ccTLD second-level registries; a production deployment swaps in the
    * full PSL snapshot (same mechanism — the set is a plan literal either
    * way, the PSL is ~9k multi-label rules). Wildcard PSL rules (`*.ck`)
    * and exception rules are not modeled by the bundled subset.
    */
  val multiLabelSuffixes: Seq[String] = Seq(
    "co.uk", "ac.uk", "gov.uk", "org.uk", "me.uk", "net.uk", "ltd.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp", "ad.jp", "ed.jp",
    "com.br", "net.br", "org.br", "gov.br", "edu.br",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    "co.in", "net.in", "org.in", "gov.in", "firm.in", "gen.in", "ind.in",
    "co.kr", "ne.kr", "or.kr", "go.kr", "re.kr", "pe.kr", "ac.kr",
    "com.mx", "org.mx", "net.mx", "edu.mx", "gob.mx",
    "com.tr", "org.tr", "net.tr", "gov.tr", "edu.tr",
    "com.ar", "org.ar", "net.ar", "gob.ar", "edu.ar",
    "com.sg", "org.sg", "net.sg", "edu.sg", "gov.sg",
    "com.hk", "org.hk", "net.hk", "edu.hk", "gov.hk",
    "com.tw", "org.tw", "net.tw", "edu.tw", "gov.tw",
    "com.my", "org.my", "net.my", "edu.my", "gov.my",
    "co.th", "or.th", "ac.th", "go.th", "in.th",
    "co.za", "org.za", "net.za", "gov.za", "ac.za", "web.za",
    "co.nz", "org.nz", "net.nz", "govt.nz", "ac.nz", "geek.nz",
    "co.id", "or.id", "ac.id", "go.id", "web.id",
    "com.vn", "org.vn", "net.vn", "edu.vn", "gov.vn",
    "com.ph", "org.ph", "net.ph", "edu.ph", "gov.ph",
    "com.pk", "org.pk", "net.pk", "edu.pk", "gov.pk",
    "com.eg", "org.eg", "net.eg", "edu.eg", "gov.eg",
    "com.sa", "org.sa", "net.sa", "edu.sa", "gov.sa",
    "com.ua", "org.ua", "net.ua", "edu.ua", "gov.ua", "in.ua",
    "com.pl", "org.pl", "net.pl", "edu.pl", "gov.pl", "waw.pl")

  /** Lower-cased host of a URL via Spark's `try_parse_url(url, 'HOST')`:
    * userinfo and port are excluded by the parser itself
    * (`https://u:p@Ex.COM:8443/x` → `ex.com`), a malformed or scheme-less
    * input yields NULL (the `try_` form — under ANSI mode plain
    * `parse_url` RAISES on malformed input, and one bad crawl row must
    * not kill a 100-TB pass; a row without a parseable authority has no
    * domain to balance by). IDN hosts are expected in punycode (`xn--…`)
    * as crawlers emit them; labels pass through untouched, never decoded.
    */
  def host(url: Column): Column =
    lower(call_function("try_parse_url", url, lit("HOST")))

  /** Reduce a (lower-case) host to its registrable domain:
    *  - NULL host → NULL (no authority, nothing to key by);
    *  - IPv4 literals and bracketed IPv6 literals pass through whole (an
    *    IP is its own "registrable domain" — capping by it is the best
    *    available key);
    *  - a trailing root dot is stripped (`example.com.` ≡ `example.com`);
    *  - hosts of ≤ 2 labels pass through (`localhost`, `example.com`);
    *  - if the last TWO labels are a bundled multi-label public suffix
    *    ([[multiLabelSuffixes]]), keep the last THREE labels
    *    (`cdn.assets.example.co.uk` → `example.co.uk`);
    *  - otherwise keep the last TWO (`www.example.com` → `example.com`).
    */
  def registrableDomain(hostCol: Column): Column = {
    val h = regexp_replace(hostCol, "\\.$", "")
    val labels = split(h, "\\.")
    val isIp = h.rlike("^[0-9]{1,3}(\\.[0-9]{1,3}){3}$") || h.startsWith("[")
    val last2 = array_join(slice(labels, -2, 2), ".")
    val last3 = array_join(slice(labels, -3, 3), ".")
    when(hostCol.isNull, lit(null).cast("string"))
      .when(isIp || size(labels) <= 2, h)
      .when(last2.isInCollection(multiLabelSuffixes), last3)
      .otherwise(last2)
  }

  /** One-call form: URL column → registrable domain. */
  def registrableDomainOfUrl(url: Column): Column =
    registrableDomain(host(url))
}
