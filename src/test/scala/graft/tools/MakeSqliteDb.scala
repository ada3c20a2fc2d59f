package graft.tools

import graft.sources.sqlite.SqliteWriter
import graft.sources.sqlite.SqliteWriter.TableSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Emit a sample database with [[SqliteWriter]] for the
  * cross-implementation check: scripts/sqlite_crosscheck.py opens the
  * file with the real SQLite C library (CPython sqlite3) and runs
  * PRAGMA integrity_check + full scans.
  *
  * Usage: sbt "Test/runMain graft.tools.MakeSqliteDb /tmp/x.db" */
object MakeSqliteDb {
  def main(args: Array[String]): Unit = {
    val path = args(0)
    val s1 = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType), StructField("tag", StringType),
      StructField("blob", BinaryType)))
    val rows1 = Seq(
      Row(1L, "alpha", 1.5, null, Array[Byte](1, 2, 3)),
      Row(2L, "", -0.25, "t", Array.emptyByteArray),
      Row(-300L, "negative int", 1e300, null, null),
      Row(1L << 40, "wide int", 4.75, "x", null))
    val s2 = StructType(Seq(
      StructField("k", LongType), StructField("pad", StringType)))
    val rows2 = (1 to 2000).map(i => Row(i.toLong, "x" * 100))
    val s3 = StructType(Seq(
      StructField("key", LongType), StructField("v", StringType)))
    val rows3 = Seq(Row(42L, "a"), Row(7L, "b"), Row(1000000L, "c"))
    // hostile corners: unicode (CJK + emoji + combining marks), a text
    // payload just under the one-page limit, ±Infinity doubles, and a
    // negative rowid-alias key (9-byte varint form)
    val rows4 = Seq(
      Row(1L, "漢字 héllo 👾 é", 1.0, null, null),
      Row(2L, "x" * 4000, Double.PositiveInfinity, "big", null),
      Row(3L, "", Double.NegativeInfinity, null,
        Array.tabulate(256)(_.toByte)))
    val rows5 = Seq(Row(-5L, "neg key"), Row(0L, "zero"), Row(9L, "pos"))
    SqliteWriter.write(path, Seq(
      TableSpec("types_t", s1, rows1),
      TableSpec("big_t", s2, rows2),
      TableSpec("alias_t", s3, rows3, rowidAlias = Some(0)),
      TableSpec("empty_t", s3, Nil),
      TableSpec("hostile_t", s1, rows4),
      TableSpec("negalias_t", s3, rows5, rowidAlias = Some(0))))
    println(s"wrote $path")
  }
}
