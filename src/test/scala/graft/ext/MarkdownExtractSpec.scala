package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Hand-computed strips for each markdown construct, the ordering
  * rules (images before links, rules before bullets, bold before
  * italic), and idempotence on already-clean text. */
class MarkdownExtractSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def extract(md: String) = {
    val r = TextOps.markdownExtract(
      Seq((1L, md)).toDF("id", "md"), "id", "md").collect().head
    (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
  }

  test("each construct strips to its text, counts land") {
    val (txt, heads, links, imgs, code) = extract(
      "# Title\n\nsee [the docs](http://x) and ![a chart](c.png)\n\n" +
        "## Sub\n\n- one\n- two\n\n1. three\n\n> quoted\n\n---\n\n" +
        "**bold** *ital* `code span` _under_\n\n```\ndropped\n```\n")
    assert(txt === "Title see the docs and a chart Sub one two three " +
      "quoted bold ital code span under")
    assert(heads === 2 && links === 1 && imgs === 1 && code === 1)
  }

  test("an image is not double-counted as a link; hr is not a bullet") {
    val (txt, _, links, imgs, _) =
      extract("![only image](i.png)\n\n---\n\n- real bullet\n")
    assert(links === 0 && imgs === 1)
    assert(txt === "only image real bullet")
  }

  test("clean text is a fixed point") {
    val plain = "just words with no markup at all"
    assert(extract(plain)._1 === plain)
    assert(extract(extract(plain)._1)._1 === plain)
  }
}
