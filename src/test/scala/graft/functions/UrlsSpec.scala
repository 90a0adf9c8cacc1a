package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class UrlsSpec extends SparkTestBase {

  private def norm(urls: String*): Seq[String] = {
    val ss = spark
    import ss.implicits._
    urls.zipWithIndex.toDF("u", "i")
      .repartition(2) // defeat ConvertToLocalRelation
      .select(col("i"), Urls.normalizeUrl(col("u")).as("n"))
      .orderBy("i").collect().map(_.getString(1)).toSeq
  }

  private def domain(hosts: String*): Seq[String] = {
    val ss = spark
    import ss.implicits._
    hosts.zipWithIndex.toDF("h", "i").repartition(2)
      .select(col("i"), Urls.registrableDomain(col("h")).as("d"))
      .orderBy("i").collect().map(_.getString(1)).toSeq
  }

  test("normalizeUrl: case, fragment, default ports, www, slash, query") {
    assert(norm(
      "HTTPS://WWW.Example.COM:443/Path/Sub/?b=2&a=1#Frag",
      "http://example.com:80/",
      "http://example.com:8080/a", // non-default port KEPT
      "https://example.com:80/a", // :80 is NOT https' default port
      "http://News.Example.com/A/B//",
      "http://example.com", // no path at all
      "http://example.com/p?only=1") == Seq(
      "https://example.com/Path/Sub?a=1&b=2",
      "http://example.com",
      "http://example.com:8080/a",
      "https://example.com:80/a",
      "http://news.example.com/A/B",
      "http://example.com",
      "http://example.com/p?only=1"))
  }

  test("normalizeUrl: path/query case preserved, IPs and punycode as-is") {
    assert(norm(
      "http://192.168.0.1:8080/CaseKept?Z=1&A=2",
      "HTTP://XN--Bcher-KVA.example/x") == Seq(
      "http://192.168.0.1:8080/CaseKept?A=2&Z=1",
      "http://xn--bcher-kva.example/x"))
  }

  test("normalizeUrl: non-URL strings pass through lowercase-trimmed") {
    assert(norm("  Not A Url  ", "relative/path") ==
      Seq("not a url", "relative/path"))
  }

  test("registrableDomain: plain, deep, second-level registries, IPs") {
    assert(domain(
      "example.com",
      "a.b.example.com",
      "news.site3.co.uk",
      "deep.sub.site.ac.jp",
      "site.com", // 2 labels
      "localhost", // 1 label: verbatim
      "192.168.0.1", // IP: verbatim
      "xn--bcher-kva.example") == Seq(
      "example.com",
      "example.com",
      "site3.co.uk",
      "site.ac.jp",
      "site.com",
      "localhost",
      "192.168.0.1",
      "xn--bcher-kva.example"))
  }

  test("hostOf strips scheme and port") {
    val ss = spark
    import ss.implicits._
    val got = Seq("https://a.b.com:8080/p?q=1", "http://c.org")
      .zipWithIndex.toDF("u", "i").repartition(2)
      .select(col("i"), Urls.hostOf(col("u")).as("h"))
      .orderBy("i").collect().map(_.getString(1)).toSeq
    assert(got == Seq("a.b.com", "c.org"))
  }
}
