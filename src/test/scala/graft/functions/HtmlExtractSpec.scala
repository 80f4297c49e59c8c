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
        lit(" 5 < 6 && 7 > 3 \"q\" 'a' end")).cast("binary")).as("m"))
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
