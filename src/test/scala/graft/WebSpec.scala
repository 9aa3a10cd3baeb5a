package graft

import org.apache.spark.sql.functions._
import graft.llm.Web

/** URL canonicalization contracts the synthetic x32 oracle cannot
  * exercise: non-default ports, param reordering, deep hosts, https vs
  * http defaults, and the dedup grouping itself. */
class WebSpec extends SparkSpec {

  private def canon(urls: String*): Seq[String] = {
    import spark.implicits._
    urls.toDF("url").select(Web.canonicalUrl(col("url")).as("c"))
      .collect().map(_.getString(0)).toSeq
  }

  test("canonicalUrl: case, default port, fragment, tracking params, param order") {
    assert(canon("HTTPS://WWW.News.Example.COM:443/a/b?utm_source=x&id=5#top")
      === Seq("https://news.example.com/a/b?id=5"))
    // http default port 80 dropped; 8080 kept
    assert(canon("http://Example.com:80/x", "http://Example.com:8080/x")
      === Seq("http://example.com/x", "http://example.com:8080/x"))
    // https on port 80 is NON-default: kept
    assert(canon("https://example.com:80/x") === Seq("https://example.com:80/x"))
    // param order never splits a class; fbclid/gclid/ref stripped
    assert(canon("https://e.com/p?b=2&a=1&fbclid=abc&gclid=x&ref=tw",
                 "https://e.com/p?a=1&b=2")
      === Seq("https://e.com/p?a=1&b=2", "https://e.com/p?a=1&b=2"))
    // all params stripped → no trailing '?'
    assert(canon("https://e.com/p?utm_campaign=z") === Seq("https://e.com/p"))
    // empty path survives as empty (host-only URL)
    assert(canon("https://WWW.e.com?a=1") === Seq("https://e.com?a=1"))
  }

  test("registrableDomain: last two labels; short hosts pass through") {
    import spark.implicits._
    val got = Seq("https://a.b.news.example.com/x", "https://example.com/x",
        "https://localhost/x")
      .toDF("url").select(Web.registrableDomain(col("url")).as("d"))
      .collect().map(_.getString(0)).toSeq
    assert(got === Seq("example.com", "example.com", "localhost"))
  }

  test("urlDedup groups post-canonical classes with deterministic representative") {
    import spark.implicits._
    val docs = Seq(
      (10L, "https://www.E.com/p?utm_source=a&id=1"),
      (3L, "https://e.com/p?id=1&utm_source=b"), // same class, smaller id
      (7L, "https://e.com/p?id=2")               // different class
    ).toDF("doc_id", "url")
    val got = Web.urlDedup(docs, "doc_id", "url")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      ("https://e.com/p?id=1", "e.com", 2L, 3L),
      ("https://e.com/p?id=2", "e.com", 1L, 7L)))
  }
}
