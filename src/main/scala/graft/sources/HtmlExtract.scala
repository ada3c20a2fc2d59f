package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML paragraph extraction (SURVEY.md S3): the reference scrapes a
  * page and takes `find_all('p')` plus a Python list slice —
  * `[3:]` for the fandom transcript pages and `[4:9]` for the wikileaf
  * strain pages (ref `Scraper.py:236-244, 338-345`).
  *
  * Engine form: pure codegen'd builtins — `regexp_extract_all` pulls
  * every `<p ...>...</p>` body (dotall, lazy, so paragraphs may span
  * lines and nested markup stays inside one match), `regexp_replace`
  * strips residual inline tags, and the slices are native `slice`
  * calls over the paragraph array. No jsoup (not needed for the
  * paragraph-level extraction the reference does, and no external jar
  * exists in this zero-egress build), no UDF: the whole pipeline stays
  * inside whole-stage codegen and scales as a map-only operator.
  */
object HtmlExtract {

  /** All `<p>` element bodies of an HTML document, in document order —
    * the `find_all('p')` equivalent. */
  def paragraphs(html: Column): Column =
    regexp_extract_all(html, lit("(?s)<p[^>]*>(.*?)</p>"), lit(1))

  /** Strip residual inline tags from extracted paragraph text (the
    * `.text` accessor on a BeautifulSoup node). */
  def stripTags(text: Column): Column =
    regexp_replace(text, "<[^>]+>", "")

  /** Python-slice `paras[from:]` (0-based, like the reference's
    * `[3:]`). */
  def sliceFrom(paras: Column, from: Int): Column =
    slice(paras, lit(from + 1), greatest(size(paras) - from, lit(0)))

  /** Python-slice `paras[from:until]` (0-based half-open, like the
    * reference's `[4:9]`). */
  def sliceRange(paras: Column, from: Int, until: Int): Column =
    when(size(paras) > from,
      slice(paras, lit(from + 1), least(size(paras) - from, lit(until - from))))
      .otherwise(array().cast("array<string>"))
}
