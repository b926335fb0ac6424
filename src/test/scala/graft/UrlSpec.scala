package graft

import graft.operators.Urls
import org.apache.spark.sql.functions._

/** URL → registrable-domain canonicalization (operators/Urls): host
  * extraction edges (ports, userinfo, case, trailing dot, IP literals,
  * punycode pass-through) and the public-suffix reduction feeding the
  * domain-balancing operators. The arithmetic face is oracle-gated
  * cross-engine by d52_registrable_domain.
  */
class UrlSpec extends SparkSpec {

  private def reg(urls: (String, Long)*): Map[Long, Option[String]] = {
    import spark.implicits._
    urls.toSeq.toDF("url", "id")
      .select(col("id"), Urls.registrableDomainOfUrl(col("url")).as("d"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
  }

  test("ports and userinfo are excluded from the host; case folds; " +
    "www and deep subdomains reduce to the registrable domain") {
    val got = reg(
      ("https://Example.COM/path", 1L),
      ("https://www.example.com:8443/x?q=1", 2L),
      ("http://user:pw@cdn.assets.example.com/y", 3L),
      ("https://a.b.c.d.example.org/", 4L))
    assert(got(1L) === Some("example.com"))
    assert(got(2L) === Some("example.com"))
    assert(got(3L) === Some("example.com"))
    assert(got(4L) === Some("example.org"))
  }

  test("multi-label public suffixes keep three labels") {
    val got = reg(
      ("https://www.example.co.uk/", 1L),
      ("https://cdn.assets.shop.example.com.au:80/z", 2L),
      ("https://example.co.uk/", 3L),     // already registrable
      ("https://co.uk/", 4L))             // the bare suffix: 2 labels, pass through
    assert(got(1L) === Some("example.co.uk"))
    assert(got(2L) === Some("example.com.au"))
    assert(got(3L) === Some("example.co.uk"))
    assert(got(4L) === Some("co.uk"))
  }

  test("IP literals, single labels, and trailing root dots") {
    val got = reg(
      ("http://192.168.10.250/admin", 1L),
      ("http://localhost:8080/", 2L),
      ("https://example.com./x", 3L),
      ("http://[2001:db8::1]/p", 4L))
    assert(got(1L) === Some("192.168.10.250"), "IPv4 passes through whole")
    assert(got(2L) === Some("localhost"))
    assert(got(3L) === Some("example.com"), "trailing root dot stripped")
    assert(got(4L) === Some("[2001:db8::1]"), "bracketed IPv6 passes through")
  }

  test("punycode IDN labels pass through untouched, never decoded") {
    val got = reg(
      ("https://www.xn--bcher-kva.example/", 1L),
      ("https://xn--fiqs8s.cn/", 2L))
    assert(got(1L) === Some("xn--bcher-kva.example"))
    assert(got(2L) === Some("xn--fiqs8s.cn"))
  }

  test("malformed / scheme-less URLs yield NULL (nothing to balance by)") {
    val got = reg(
      ("not a url at all", 1L),
      ("/relative/path/only", 2L),
      ("https://good.example.com/x", 3L))
    assert(got(1L) === None)
    assert(got(2L) === None)
    assert(got(3L) === Some("example.com"))
  }

  test("registrable domains feed domainCap directly: subdomain-spread " +
    "megadomain collapses to one capped key") {
    import spark.implicits._
    // 40 docs across 40 distinct subdomains of one site + 3 on another.
    val rows = ((0 until 40).map(i =>
        (i.toLong, s"https://s$i.example.co.uk/p$i", 100L - i)) ++
      Seq((100L, "https://other.net/a", 9L), (101L, "https://www.other.net/b", 8L),
        (102L, "https://other.net/c", 7L)))
      .toDF("doc_id", "url", "score")
      .withColumn("domain", Urls.registrableDomainOfUrl(col("url")))
    val capped = graft.operators.Curation
      .domainCap(rows, "domain", "score", "doc_id", cap = 5)
      .groupBy("domain").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(capped === Map("example.co.uk" -> 5L, "other.net" -> 3L),
      "per-subdomain keys would have kept all 40; the registrable key caps at 5")
  }
}
