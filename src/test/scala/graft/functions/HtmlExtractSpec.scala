package graft.functions

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-walked HTML→text extraction semantics — the cases the pipeline
  * ORDER exists for (tags before entities, &amp; last, blocks before
  * tags), plus the do-no-harm case: plain text passes through.
  */
class HtmlExtractSpec extends AnyFunSuite with SparkTest {

  private def extract(htmls: String*): Seq[String] = {
    import spark.implicits._
    htmls.toDF("h").select(TextFunctions.extractHtmlText(col("h")))
      .collect().map(_.getString(0)).toSeq
  }

  test("tags strip to spaces; text survives with collapsed whitespace") {
    assert(extract("<p>hello <b>bold</b>   world</p>") == Seq("hello bold world"))
    assert(extract("plain text, no markup") == Seq("plain text, no markup"))
    assert(extract("<div><ul><li>a</li><li>b</li></ul></div>") == Seq("a b"))
  }

  test("script/style blocks vanish wholesale, embedded '<' included") {
    assert(extract("<script>if (1 < 2) { x(); }</script>keep") == Seq("keep"))
    assert(extract("<style>p > span { a: 1 }</style>keep") == Seq("keep"))
    assert(extract("a<script>\nmulti\nline\n</script>b") == Seq("a b"))
  }

  test("entities decode AFTER tags; &amp; decodes last") {
    // literal markup in prose survives as text — never re-stripped
    assert(extract("<p>use &lt;b&gt; for bold</p>") == Seq("use <b> for bold"))
    // &amp;lt; means the four characters '&lt;', not '<'
    assert(extract("write &amp;lt; to escape") == Seq("write &lt; to escape"))
    assert(extract("5 &lt; 6 &amp;&amp; 7 &gt; 3 &quot;q&quot; &apos;a&apos;&nbsp;end") ==
      Seq("5 < 6 && 7 > 3 \"q\" 'a' end"))
  }

  test("comments strip wholesale, including '>' inside them") {
    // the generic <[^>]*> strip would cut this comment at 'a >' and
    // leak "b --> leaked" into the text
    assert(extract("keep<!-- a > b --> tail") == Seq("keep tail"))
    assert(extract("<!-- multi\nline\ncomment -->x") == Seq("x"))
    // commented-out markup vanishes with the comment
    assert(extract("a<!-- <p>dead</p> -->b") == Seq("a b"))
    // a script block containing a comment-opener is still ONE block
    assert(extract("<script>var s = \"<!--\";</script>keep") == Seq("keep"))
  }

  test("numeric character references decode in printable ASCII, pass through outside") {
    assert(extract("&#65;&#x42;&#x7a;") == Seq("ABz"))
    assert(extract("&#X42;") == Seq("B")) // capital-X hex form
    assert(extract("&#0065;") == Seq("A")) // leading zeros
    // out of printable ASCII: intact (the cross-engine chr boundary)
    assert(extract("q &#8217; s") == Seq("q &#8217; s"))
    assert(extract("&#x1F600;") == Seq("&#x1F600;"))
    assert(extract("&#31;&#127;") == Seq("&#31;&#127;"))
    // malformed: no digits, unterminated, non-hex — all intact
    assert(extract("&#zz; &#65 &#xG1;") == Seq("&#zz; &#65 &#xG1;"))
    // decoded '<' is NOT re-stripped as a tag (decode is after tags)
    assert(extract("&#60;b&#62;") == Seq("<b>"))
    // remainder after the ref stays: '&#65;bc' -> 'Abc'
    assert(extract("&#65;bc") == Seq("Abc"))
  }

  test("ampersand numeric forms single-decode like &amp;") {
    // &#38;lt; means the four characters '&lt;', not '<'
    assert(extract("&#38;lt;") == Seq("&lt;"))
    assert(extract("&#x26;gt;") == Seq("&gt;"))
    // double-encoded &amp;#65; yields the literal '&#65;', never 'A'
    assert(extract("&amp;#65;") == Seq("&#65;"))
    assert(extract("&#38;") == Seq("&"))
  }

  test("q111's synthesized wrapper round-trips the document text") {
    import spark.implicits._
    val got = graft.queries.QueryPack.htmlExtract(spark, "/root/testdata/sf0.001")
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    // recompute the expected extraction directly from the raw text:
    // title + heading + text (whitespace-collapsed) + decoded gauntlet
    val expected = docs.select(col("doc_id"),
      md5(concat(lit("Doc "), col("doc_id"), lit(" Doc "), col("doc_id"), lit(" "),
        trim(regexp_replace(col("text"), "\\s+", " ")),
        lit(" 5 < 6 && 7 > 3 \"q\" 'a' end"),
        lit(" ABz n &lt; a &#8217; u &#x1F600; e &#65; d 100%zz"))
        .cast("binary")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val gotMap = got.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // documents with empty/whitespace-only text collapse differently
    // (the '<p></p>' boundary spaces merge) — compare the non-empty ones
    val nonEmpty = docs.filter(trim(col("text")) =!= "").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(nonEmpty.nonEmpty)
    nonEmpty.foreach { id =>
      assert(gotMap(id) == expected(id), s"doc $id extraction diverged")
    }
  }
}
