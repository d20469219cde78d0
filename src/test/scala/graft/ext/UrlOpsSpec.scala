package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** URL canonicalization rules, one hand case per rule, plus the
  * rule-composition case and the survivors (non-default port, non-www
  * subdomain, meaningful params). */
class UrlOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def norm(u: String): String =
    Seq(u).toDF("url").select(UrlOps.normalize(col("url"))).head().getString(0)
  private def host(u: String): String =
    Seq(u).toDF("url").select(UrlOps.host(col("url"))).head().getString(0)
  private def reg(u: String): String =
    Seq(u).toDF("url").select(UrlOps.registeredDomain(col("url")))
      .head().getString(0)

  test("case, default port, www, slash, fragment, trackers all strip") {
    assert(norm("HTTPS://WWW.Ex.COM:443/a/b/?utm_source=x&q=1#frag") ==
      "https://ex.com/a/b?q=1")
  }

  test("http strips :80 but keeps :8080; https keeps :80") {
    assert(norm("http://ex.com:80/a") == "http://ex.com/a")
    assert(norm("http://ex.com:8080/a") == "http://ex.com:8080/a")
    assert(norm("https://ex.com:80/a") == "https://ex.com:80/a")
  }

  test("query params sort; tracking family drops; empty query drops the ?") {
    assert(norm("https://ex.com/p?b=2&a=1") == "https://ex.com/p?a=1&b=2")
    assert(norm("https://ex.com/p?utm_campaign=x&fbclid=1&gclid=2&ref=rss")
      == "https://ex.com/p")
    assert(norm("https://ex.com/p?") == "https://ex.com/p")
  }

  test("only a LEADING www strips; other subdomains survive") {
    assert(host("https://www.ex.com/") == "ex.com")
    assert(host("https://cdn.www.ex.com/") == "cdn.www.ex.com")
    assert(host("https://wwwx.ex.com/") == "wwwx.ex.com")
  }

  test("registered domain is the last two labels") {
    assert(reg("https://a.b.site3.org/x") == "site3.org")
    assert(reg("http://site3.org/x") == "site3.org")
  }

  test("root path collapses; deep trailing slashes collapse") {
    assert(norm("https://ex.com/") == "https://ex.com")
    assert(norm("https://ex.com/a//") == "https://ex.com/a")
  }

  test("normalize is idempotent over the planted-mess corpus") {
    // a canonical URL has nothing left to strip: re-normalizing the
    // normalized form must be the identity, or the canonical key is
    // not a fixed point and URL dedup would depend on pass count
    val urls = graft.queries.ExtQueries.all("q_url_normalize")(
      spark, "/root/testdata/sf0.001")
    val twice = urls.select(col("norm_url"),
      UrlOps.normalize(col("norm_url")).as("again"))
    assert(twice.filter(col("again") =!= col("norm_url")).count() == 0)
  }
}
