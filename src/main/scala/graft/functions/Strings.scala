package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar string/normalization functions (SURVEY.md §2.7, F1-F9).
  * All are compositions of codegen'd `functions._` builtins — no UDFs,
  * so they stay inside whole-stage codegen and cost nothing at scale.
  */
object Strings {

  /** F3 exact `str.capitalize` semantics (Scraper.py:405): first char
    * upper, REST lower (initcap would capitalize every word). */
  def capitalize(c: Column): Column =
    concat(upper(substring(c, 1, 1)), lower(c.substr(lit(2), length(c))))

  /** F4: the reference strips ':' from episode names EXCEPT for episode
    * ids 19/25/32/35 (Scraper.py:295-297 — those pages needed the raw
    * name), then strips ',' unconditionally. */
  def conditionalStrip(name: Column, id: Column, keepIds: Seq[Int]): Column = {
    val colonStripped =
      when(id.isin(keepIds.map(_.asInstanceOf[Any]): _*), name)
        .otherwise(regexp_replace(name, ":", ""))
    regexp_replace(colonStripped, ",", "")
  }

  /** F5: URL slug — whitespace runs → single underscore
    * (Scraper.py:230-231 split+join). */
  def slug(c: Column): Column = regexp_replace(c, "\\s+", "_")

  /** F7: word count. */
  def wordCount(c: Column): Column = size(split(c, "\\s+"))

  /** F6: URL templating (Scraper.py:232). */
  def fandomUrl(slugged: Column): Column =
    concat(lit("https://rickandmorty.fandom.com/wiki/"), slugged)
}
