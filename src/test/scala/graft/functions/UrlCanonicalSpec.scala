package graft.functions

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-walked URL canonicalization cases — each noise axis alone, all
  * together, the cases that must NOT change, and idempotence (a
  * canonical URL is its own canonical form, so re-canonicalizing a
  * deduped corpus is a no-op).
  */
class UrlCanonicalSpec extends AnyFunSuite with SparkTest {

  private def canon(urls: String*): Seq[String] = {
    import spark.implicits._
    urls.toDF("u").select(TextFunctions.canonicalizeUrl(col("u"))).collect()
      .map(_.getString(0)).toSeq
  }

  test("each noise axis collapses; semantics-bearing parts survive") {
    assert(canon("HTTP://Site.com/p") == Seq("http://site.com/p"))
    assert(canon("http://www.site.com/p") == Seq("http://site.com/p"))
    assert(canon("http://site.com:80/p") == Seq("http://site.com/p"))
    assert(canon("http://site.com/p#sec-2") == Seq("http://site.com/p"))
    assert(canon("http://site.com/p?b=2&a=1") == Seq("http://site.com/p?a=1&b=2"))
    assert(canon("http://site.com/p?utm_source=x&a=1&utm_campaign=y") ==
      Seq("http://site.com/p?a=1"))
    // paths are case-sensitive — never folded
    assert(canon("http://site.com/Docs/A") == Seq("http://site.com/Docs/A"))
    // non-default port survives; www elsewhere than prefix survives
    assert(canon("http://site.com:8080/p") == Seq("http://site.com:8080/p"))
    assert(canon("http://wwwsite.com/p") == Seq("http://wwwsite.com/p"))
    // all axes at once
    assert(canon("HTTPS://WWW.Site.COM:80/Path/x?utm_source=f&b=2&a=1#frag") ==
      Seq("https://site.com/Path/x?a=1&b=2"))
    // utm-only query drops the '?' entirely
    assert(canon("http://site.com/p?utm_source=x") == Seq("http://site.com/p"))
    // bare host: empty path keeps the trailing slash form
    assert(canon("http://site.com") == Seq("http://site.com/"))
  }

  test("idempotent: canonical output is a fixed point") {
    import spark.implicits._
    val inputs = Seq(
      "HTTP://WWW.A.com:80/P?utm_x=1&b=2&a=1#f",
      "https://b.org/x/y?z=1",
      "http://site.com/p",
      "http://site.com")
    val once = inputs.toDF("u")
      .select(TextFunctions.canonicalizeUrl(col("u")).as("c"))
    val twice = once.select(TextFunctions.canonicalizeUrl(col("c")))
      .collect().map(_.getString(0)).toSeq
    assert(twice == once.collect().map(_.getString(0)).toSeq)
  }

  test("alias classes group correctly in the q109 shape") {
    import spark.implicits._
    val aliases = Seq(
      "HTTP://WWW.site.com:80/p?b=2&a=1",
      "http://site.com/p?a=1&b=2",
      "http://Site.COM/p?utm_source=x&a=1&b=2#frag")
    val distinctUrl = Seq("http://site.com/q?a=1")
    val got = (aliases ++ distinctUrl).zipWithIndex
      .map { case (u, i) => (i.toLong, u) }.toDF("doc_id", "u")
      .select(col("doc_id"), TextFunctions.canonicalizeUrl(col("u")).as("c"))
      .groupBy(col("c"))
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("first"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(
      "http://site.com/p?a=1&b=2" -> ((3L, 0L)),
      "http://site.com/q?a=1" -> ((1L, 3L))))
  }
}
