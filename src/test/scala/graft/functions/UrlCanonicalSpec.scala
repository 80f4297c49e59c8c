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

  test("query with no path does not leak into the host") {
    // the '?' precedes any '/': the host split must stop at it
    assert(canon("http://site.com?a=1") == Seq("http://site.com/?a=1"))
    assert(canon("http://site.com?b=2&a=1") == Seq("http://site.com/?a=1&b=2"))
    assert(canon("HTTP://WWW.Site.com:80?utm_source=x&a=1") ==
      Seq("http://site.com/?a=1"))
    // ... and the alias with an explicit '/' collapses to the same form
    assert(canon("http://site.com/?a=1") == Seq("http://site.com/?a=1"))
  }

  test("percent-encoding: unreserved decodes, hex case folds, reserved survives") {
    // %7E is unreserved (RFC 3986 §2.3) — always decoded
    assert(canon("http://site.com/%7Euser") == Seq("http://site.com/~user"))
    assert(canon("http://site.com/%7euser") == Seq("http://site.com/~user"))
    // letters/digits decode too: %6F = o, %41 = A (case-sensitive!)
    assert(canon("http://site.com/D%6fcs") == Seq("http://site.com/Docs"))
    assert(canon("http://site.com/%41bc") == Seq("http://site.com/Abc"))
    // reserved escapes are NOT decoded (decoding %2F would change the
    // path structure) — but their hex case folds to uppercase
    assert(canon("http://site.com/a%2fb") == Seq("http://site.com/a%2Fb"))
    assert(canon("http://site.com/p?q=1%3a2") == Seq("http://site.com/p?q=1%3A2"))
    // '%' followed by non-hex passes through untouched
    assert(canon("http://site.com/100%zz") == Seq("http://site.com/100%zz"))
    assert(canon("http://site.com/100%") == Seq("http://site.com/100%"))
    // %25 (the escape of '%' itself) survives and cannot cascade
    assert(canon("http://site.com/a%2541") == Seq("http://site.com/a%2541"))
    // percent noise in the HOST collapses aliases the same way
    assert(canon("http://s%69te.com/p") == Seq("http://site.com/p"))
  }

  test("host trailing root dot strips; inner dots and non-default ports survive") {
    assert(canon("http://example.com./p") == Seq("http://example.com/p"))
    assert(canon("http://example.com.") == Seq("http://example.com/"))
    assert(canon("http://WWW.example.com.:80/p") == Seq("http://example.com/p"))
    // trailing dot with a NON-default port: dot strips, port stays
    assert(canon("http://example.com.:8080/p") == Seq("http://example.com:8080/p"))
    // a bare trailing colon (empty port) drops
    assert(canon("http://example.com:/p") == Seq("http://example.com/p"))
    // inner dots are structure, never stripped
    assert(canon("http://a.b.example.com/p") == Seq("http://a.b.example.com/p"))
  }

  test("idempotent: canonical output is a fixed point") {
    import spark.implicits._
    val inputs = Seq(
      "HTTP://WWW.A.com:80/P?utm_x=1&b=2&a=1#f",
      "https://b.org/x/y?z=1",
      "http://site.com/p",
      "http://site.com",
      "http://site.com?a=1",
      "http://example.com./%7Euser%2Fx?b=%3a1",
      "http://e.com.:8080/100%zz")
    val once = inputs.toDF("u")
      .select(TextFunctions.canonicalizeUrl(col("u")).as("c"))
    val twice = once.select(TextFunctions.canonicalizeUrl(col("c")))
      .collect().map(_.getString(0)).toSeq
    assert(twice == once.collect().map(_.getString(0)).toSeq)
  }

  test("generated batch: noise axes never split an alias class, identities never merge") {
    import spark.implicits._
    // 125 identities × 4 noisy variants each, all noise from a
    // deterministic LCG: same identity ⇒ same canonical (noise axes
    // are invisible), different identity ⇒ different canonical (the
    // semantics-bearing parts survive)
    var seed = 42L
    def next(n: Int): Int = { seed = seed * 6364136223846793005L + 1442695040888963407L; (((seed >>> 33) % n) + n).toInt % n }
    val rows = for {
      ident <- 0 until 125
      variant <- 0 until 4
    } yield {
      val host = s"h${ident % 5}.com"
      val path = s"P${(ident / 5) % 5}/x"
      val params = (ident / 25) % 5 match {
        case 0 => Seq.empty
        case 1 => Seq("a=1")
        case 2 => Seq("a=1", "b=2")
        case 3 => Seq("b=2", "c=3")
        case 4 => Seq("a=2")
      }
      val scheme = if (next(2) == 0) "http" else "HTTP"
      val www = Seq("", "www.", "WWW.")(next(3))
      val hostCase = if (next(2) == 0) host else host.toUpperCase
      val rootDot = if (next(2) == 0) "" else "."
      val port = if (next(2) == 0) "" else ":80"
      // percent noise on a fixed path suffix: ~q ≡ %7Eq ≡ %7eq
      // (unreserved decode + hex-case fold)
      val suffix = Seq("~q", "%7Eq", "%7eq")(next(3))
      val shuffled = if (next(2) == 0) params else params.reverse
      val utm = if (next(2) == 0) Seq.empty else Seq(s"utm_c=${next(9)}")
      val q = (utm ++ shuffled).mkString("&")
      val frag = if (next(2) == 0) "" else s"#s${next(9)}"
      val url = s"$scheme://$www$hostCase$rootDot$port/$path$suffix" +
        (if (q.nonEmpty) s"?$q" else "") + frag
      (ident.toLong, url)
    }
    val canon = rows.toDF("ident", "u")
      .select(col("ident"), TextFunctions.canonicalizeUrl(col("u")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val byIdent = canon.groupBy(_._1).map { case (i, vs) => i -> vs.map(_._2).distinct }
    assert(byIdent.forall(_._2.size == 1),
      s"noise split an alias class: ${byIdent.filter(_._2.size > 1).take(2)}")
    val canonicals = byIdent.map { case (i, vs) => i -> vs.head }
    assert(canonicals.values.toSeq.distinct.size == 125,
      "distinct identities merged under canonicalization")
    // structural invariants on every canonical form
    canonicals.values.foreach { c =>
      assert(!c.contains("#") && !c.contains("utm_") && !c.contains(":80"),
        s"noise survived in $c")
      assert(c.startsWith("http://h") && c.contains(".com/P"),
        s"unexpected shape: $c")
      if (c.contains("?")) {
        val ps = c.substring(c.indexOf('?') + 1).split("&").toSeq
        assert(ps == ps.sorted, s"params unsorted in $c")
      }
    }
    // batch idempotence over the whole generated set
    val once = rows.toDF("ident", "u")
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
