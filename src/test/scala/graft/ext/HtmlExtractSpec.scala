package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** HTML extraction semantics on hand-planted fixtures: script/style
  * elements drop whole, comments drop, the link-density rule kills
  * navigation while keeping prose, entities decode once (&amp; last),
  * and the clean text composes with the normalize chain.
  */
class HtmlExtractSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def extract(html: String): (String, Long, Long, Long) = {
    val out = TextOps.htmlExtract(
      Seq((1L, html)).toDF("id", "html"), "id", "html").collect()(0)
    (out.getString(1), out.getLong(2), out.getLong(3), out.getLong(4))
  }

  test("script/style content and comments never reach the text") {
    val (txt, _, _, _) = extract(
      "<html><head><script>var secret = 42;</script><style>p{color:red}" +
        "</style></head><body><!-- hidden note --><p>real words stay here" +
        "</p></body></html>")
    assert(txt == "real words stay here")
    assert(!txt.contains("secret") && !txt.contains("color") &&
      !txt.contains("hidden"))
  }

  test("link-dense navigation drops; prose with an inline link stays") {
    val (txt, _, kept, links) = extract(
      "<body><nav><a href='/'>Home</a> <a href='/x'>About</a> " +
        "<a href='/y'>More</a></nav>" +
        "<p>a paragraph with one <a href='/z'>link</a> inside plenty of " +
        "words</p></body>")
    assert(kept == 1L && links == 4L)
    assert(txt == "a paragraph with one link inside plenty of words")
  }

  test("short heading blocks fall below the word floor") {
    val (txt, _, kept, _) = extract(
      "<body><h1>Two words</h1><p>this block carries enough words to " +
        "survive</p></body>")
    assert(kept == 1L)
    assert(txt == "this block carries enough words to survive")
  }

  test("entities decode once, &amp; last (no double decode)") {
    val (txt, _, _, _) = extract(
      "<body><p>fish &amp; chips cost &lt;5&gt; &amp;lt;literally&amp;gt;" +
        "</p></body>")
    // &amp;lt; decodes exactly one level: -> &lt; (not <)
    assert(txt == "fish & chips cost <5> &lt;literally&gt;")
  }

  test("a fully-boilerplate document keeps its row with empty text") {
    val (txt, blocks, kept, _) = extract(
      "<body><nav><a>a</a> <a>b</a></nav><footer><a>c</a></footer></body>")
    assert(txt == "" && kept == 0L && blocks >= 1L)
  }

  test("clean text feeds the normalize chain") {
    val df = Seq((7L,
      "<body><p>The QUICK brown-fox says &quot;hi&quot; twice!</p></body>"))
      .toDF("id", "html")
    val out = TextOps.htmlExtract(df, "id", "html")
      .select(col("id"), TextOps.normalize(col("clean_text")).as("norm"))
      .collect()(0)
    assert(out.getString(1) == "the quick brownfox says hi twice")
  }
}
