package graft

import org.apache.spark.sql.functions._
import graft.sources.HtmlExtract

/** S3 extraction semantics: `find_all('p')` + the reference's Python
  * slices `[3:]` (transcript pages, Scraper.py:236-244) and `[4:9]`
  * (strain pages, Scraper.py:338-345). */
class HtmlExtractSpec extends SparkSpec {
  import spark.implicits._

  private val page =
    """<html><head><title>t</title></head><body>
      |<p class="nav">Nav</p>
      |<p>Header
      |line two</p>
      |<p>Ad <b>bold</b> tail</p>
      |<p>Para3</p>
      |<p>Para4</p>
      |<p>Para5</p>
      |<div><p>Para6</p></div>
      |<p>Para7</p>
      |<p>Para8</p>
      |<p>Para9</p>
      |<p>Para10</p>
      |</body></html>""".stripMargin

  private def extract(html: String) =
    Seq(html).toDF("html")
      .select(HtmlExtract.paragraphs($"html").as("ps"))

  test("paragraphs = find_all('p'): document order, dotall, attrs kept out") {
    val ps = extract(page).as[Seq[String]].head()
    assert(ps.length == 11)
    assert(ps.head == "Nav")
    assert(ps(1) == "Header\nline two") // dotall: <p> spanning lines
    assert(ps(2) == "Ad <b>bold</b> tail") // inner markup stays in the body
    assert(ps(6) == "Para6") // nested inside <div> still found
  }

  test("stripTags removes residual inline markup (the .text accessor)") {
    val got = Seq("Ad <b>bold</b> tail").toDF("t")
      .select(HtmlExtract.stripTags($"t")).as[String].head()
    assert(got == "Ad bold tail")
  }

  test("[3:] slice matches Python semantics, including short documents") {
    val ps = extract(page).select(HtmlExtract.sliceFrom($"ps", 3))
      .as[Seq[String]].head()
    assert(ps == Seq("Para3", "Para4", "Para5", "Para6", "Para7",
      "Para8", "Para9", "Para10"))
    // shorter than the slice start → empty, like Python [3:]
    val short = extract("<p>a</p><p>b</p>")
      .select(HtmlExtract.sliceFrom($"ps", 3)).as[Seq[String]].head()
    assert(short == Seq())
  }

  test("[4:9] slice matches Python half-open semantics") {
    val ps = extract(page).select(HtmlExtract.sliceRange($"ps", 4, 9))
      .as[Seq[String]].head()
    assert(ps == Seq("Para4", "Para5", "Para6", "Para7", "Para8"))
    // fewer than 9 paragraphs → clamped, like Python
    val five = extract("<p>a</p><p>b</p><p>c</p><p>d</p><p>e</p>")
      .select(HtmlExtract.sliceRange($"ps", 4, 9)).as[Seq[String]].head()
    assert(five == Seq("e"))
    val four = extract("<p>a</p><p>b</p><p>c</p><p>d</p>")
      .select(HtmlExtract.sliceRange($"ps", 4, 9)).as[Seq[String]].head()
    assert(four == Seq())
  }
}
