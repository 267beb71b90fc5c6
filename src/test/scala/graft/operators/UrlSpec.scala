package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UrlSpec extends SparkSpec {
  import spark.implicits._

  private def norm(urls: String*) =
    Url.normalize(urls.zipWithIndex.map { case (u, i) => (i.toLong, u) }
        .toDF("id", "url"), "id", "url")
      .orderBy("id")
      .select("url_canonical", "host", "registered_domain", "n_params_kept")
      .as[(String, String, String, Long)]
      .collect()

  test("scheme and host lower, default ports stripped, explicit ports kept") {
    val got = norm(
      "HTTPS://WWW.Example.COM:443/a",
      "http://example.com:80/a",
      "http://example.com:8080/a")
    assert(got(0)._1 == "https://www.example.com/a")
    assert(got(1)._1 == "http://example.com/a")
    assert(got(2)._1 == "http://example.com:8080/a")
  }

  test("tracking params dropped, the rest sorted; empty query omitted") {
    val got = norm(
      "http://e.com/p?utm_source=x&b=2&a=1&gclid=g",
      "http://e.com/p?utm_campaign=only",
      "http://e.com/p?z=1&y=2")
    assert(got(0)._1 == "http://e.com/p?a=1&b=2" && got(0)._4 == 2L)
    assert(got(1)._1 == "http://e.com/p" && got(1)._4 == 0L)
    assert(got(2)._1 == "http://e.com/p?y=2&z=1" && got(2)._4 == 2L)
  }

  test("path and fragment rules: empty->root, trailing slash stripped, fragment dropped") {
    val got = norm(
      "http://e.com",
      "http://e.com/",
      "http://e.com/a/b/",
      "http://e.com/a#frag")
    assert(got.map(_._1).toSeq == Seq(
      "http://e.com/", "http://e.com/", "http://e.com/a/b", "http://e.com/a"))
  }

  test("registered domain honors multi-label public suffixes") {
    val got = norm(
      "http://a.b.news.co.uk/",
      "http://deep.sub.example.com/",
      "http://user.github.io/",
      "http://example.com/",
      "http://site3.github.io/x")
    assert(got.map(_._3).toSeq == Seq(
      "news.co.uk", "example.com", "user.github.io", "example.com",
      "site3.github.io"))
  }

  test("canonicalization is idempotent") {
    val urls = (0L until 200L).map(i => (i, null)).toDF("doc_id", "x")
      .select(col("doc_id"), Url.synthesizeUrl(col("doc_id")).as("url"))
    val once = urls.select(col("doc_id"), Url.canonicalize(col("url")).as("url"))
    val twice = once.select(col("doc_id"), Url.canonicalize(col("url")).as("url"))
    val a = once.as[(Long, String)].collect().sortBy(_._1).toSeq
    val b = twice.as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(a == b)
  }

  test("normalize is a pure scan: no Exchange in the plan") {
    val urls = spark.range(10).select(col("id"),
      Url.synthesizeUrl(col("id")).as("url"))
    val phys = Url.normalize(urls, "id", "url")
      .queryExecution.executedPlan.toString
    assert(!phys.contains("Exchange"), s"normalize must not shuffle:\n$phys")
  }
}
