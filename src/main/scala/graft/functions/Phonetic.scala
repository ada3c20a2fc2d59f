package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Phonetic encoding for blocking — simplified American Soundex
  * (Russell & Odell's 1918 code, the classic record-linkage blocking
  * key that groups names sounding alike: Robert/Rupert → R163).
  *
  * Exact variant implemented (documented so engine and oracle agree
  * letter-for-letter): uppercase, strip non-letters, keep the first
  * letter, map every letter through the standard table
  * (BFPV→1 CGJKQSXZ→2 DT→3 L→4 MN→5 R→6, vowels AEIOUY and H W →0),
  * collapse adjacent equal codes, drop the first code (it belongs to
  * the kept first letter), drop the 0 separators, take three digits
  * right-padded with 0. This is full Soundex MINUS the H/W
  * transparency rule (classic Soundex lets H/W between two same-coded
  * consonants collapse them; here H/W act as vowels — the common
  * "simplified soundex" found in SQL dialects). Ashcraft → A226 here
  * vs A261 in transparent Soundex; Robert → R163, Tymczak → T522,
  * Pfister → P236 agree with the standard either way.
  *
  * Implementation is pure string built-ins — translate for the code
  * table, a regex backreference `(.)\1+ → $1` for the run collapse —
  * so the whole key is whole-stage-codegen'd (no UDF, no HOF) and
  * byte-replayable in ANSI SQL. NULL/letterless input → NULL. */
object Phonetic {

  private val Letters = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
  private val Codes = "01230120022455012623010202"

  def soundexSimplified(name: Column): Column = {
    val letters = regexp_replace(upper(name), "[^A-Z]", "")
    val collapsed = regexp_replace(
      translate(letters, Letters, Codes), "(.)\\1+", "$1")
    val tail3 = substring(
      regexp_replace(substring(collapsed, 2, 1000000), "0", ""), 1, 3)
    when(length(letters) === 0, lit(null).cast("string"))
      .otherwise(concat(substring(letters, 1, 1), rpad(tail3, 3, "0")))
  }
}
