package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HtmlSpec extends SparkSpec {
  import spark.implicits._

  private val page =
    """<!DOCTYPE html><html><head><title>My page</title>
      |<style>body { color: red; }</style>
      |<script>if (1 < 2) { alert("hi"); }</script>
      |</head><body><!-- comment with <p>fake tags</p> inside -->
      |<nav><ul><li><a href="/">Home</a></li><li><a href="/b">Blog</a></li></ul></nav>
      |<article><h1>Heading words here</h1>
      |<p>This is the first real content paragraph with plenty of words inside it.</p>
      |<p>Second paragraph also has enough words to clear the keep threshold
      |easily, plus a <a href="/x">link to elsewhere</a> in running text.</p>
      |<div class="share"><a href="#">Share</a> <a href="#">Tweet</a></div>
      |</article><footer><p>&copy; 2024 Corp &amp; Co &#39;legal&#39; <a href="/t">Terms &amp; conditions</a></p></footer>
      |</body></html>""".stripMargin.replace("\n", "")

  private def blockRows = Html.blocks(
      Seq((1L, page)).toDF("doc_id", "html"), "doc_id", "html")
    .select($"text", $"n_words", $"link_chars", $"link_density", $"kept")
    .as[(String, Long, Long, Double, Boolean)].collect().toSeq

  test("content paragraphs are kept; nav/share/footer chrome is dropped") {
    val rows = blockRows
    val kept = rows.filter(_._5).map(_._1)
    assert(kept.exists(_.startsWith("This is the first real content")))
    assert(kept.exists(_.startsWith("Second paragraph also has")))
    assert(kept.size == 2, kept)
    val dropped = rows.filterNot(_._5).map(_._1)
    assert(dropped.contains("Home")) // nav item: too few words
    assert(dropped.contains("Share Tweet")) // share bar: link density 1.0
    assert(dropped.exists(_.startsWith("&copy; 2024 Corp & Co"))) // footer (unknown entities stay literal)
  }

  test("script/style/comment content never reaches any block") {
    val all = blockRows.map(_._1).mkString(" ")
    assert(!all.contains("alert"))
    assert(!all.contains("color: red"))
    assert(!all.contains("fake tags"))
  }

  test("entities unescape and link density counts only visible link text") {
    val rows = blockRows
    val footer = rows.find(_._1.startsWith("&copy; 2024")).get
    assert(footer._1 == "&copy; 2024 Corp & Co 'legal' Terms & conditions")
    // link text "Terms & conditions" = 18 visible chars
    assert(footer._3 == 18L)
    val second = rows.find(_._1.startsWith("Second paragraph")).get
    assert(second._3 == "link to elsewhere".length.toLong)
    assert(second._4 < 0.33 && second._5)
  }

  test("extractText joins kept blocks in block order with tallies") {
    val out = Html.extractText(
        Seq((1L, page)).toDF("doc_id", "html"), "doc_id", "html")
      .select($"doc_id", $"text", $"n_blocks_kept", $"n_blocks_dropped")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(out.size == 1)
    val (_, text, kept, dropped) = out.head
    assert(text.startsWith("This is the first real content"))
    assert(text.contains("Second paragraph"))
    assert(text.indexOf("This is") < text.indexOf("Second paragraph"))
    assert(kept == 2L && dropped > 4L)
    // a page of pure chrome disappears entirely
    val chrome = "<nav><a href=\"/\">Home</a></nav><footer><a href=\"/t\">Terms</a></footer>"
    assert(Html.extractText(
      Seq((2L, chrome)).toDF("doc_id", "html"), "doc_id", "html").count() == 0)
  }

  test("block segmentation is a scan-side generate (no shuffle before doc agg)") {
    val df = Seq((1L, page)).toDF("doc_id", "html")
    val exec = Html.blocks(df, "doc_id", "html").queryExecution.executedPlan.toString
    assert(!exec.contains("Exchange"), exec)
    assert(exec.contains("Generate"), exec) // posexplode to block grain
  }

  test("synthesizePage composes with the gate thresholds as designed") {
    val docs = Seq((0L, ("alpha beta gamma delta " * 8).trim),
      (1L, ("epsilon zeta eta theta " * 8).trim)).toDF("doc_id", "text")
    val pages = docs.select($"doc_id",
      Html.synthesizePage($"doc_id", $"text").as("html"))
    val b = Html.blocks(pages, "doc_id", "html")
    // per page: two kept content paragraphs, chrome dropped
    val rows = b.select($"doc_id", $"kept").as[(Long, Boolean)].collect()
    assert(rows.filter(_._2).groupBy(_._1).forall(_._2.length == 2))
    // even doc has the extra nav item -> one more dropped block
    val droppedByDoc = rows.filterNot(_._2).groupBy(_._1).view.mapValues(_.length)
    assert(droppedByDoc(0L) == droppedByDoc(1L) + 1)
  }
}
