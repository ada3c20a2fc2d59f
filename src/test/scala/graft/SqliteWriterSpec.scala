package graft

import java.nio.file.Files

import graft.sources.sqlite.{SqliteFile, SqliteWriter}
import graft.sources.sqlite.SqliteWriter.TableSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** The from-scratch SQLite WRITER pinned three ways: (1) byte-level
  * round trip through the engine's own from-scratch reader (which is
  * itself pinned against the real reference .db); (2) structural
  * assertions on the emitted pages (interior root for multi-leaf
  * tables, rowid-alias NULL-in-record form); (3) the failure contracts
  * (oversized record, duplicate alias rowids). A fourth,
  * cross-implementation check against the CPython sqlite3 C library
  * lives in scripts/sqlite_crosscheck.py. */
class SqliteWriterSpec extends SparkSpec {

  private def tmpDb(): String =
    Files.createTempDirectory("graft_sw").resolve("t.db").toString

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("score", DoubleType),
    StructField("tag", StringType),
    StructField("blob", BinaryType)))

  test("round trip: all serial types, NULLs, negative and wide ints") {
    val rows = Seq(
      Row(1L, "alpha", 1.5, null, Array[Byte](1, 2, 3)),
      Row(2L, "", -0.0, "t", Array.emptyByteArray),
      Row(-300L, "neg rowid range", 1e300, null, null),
      Row(1L << 40, "wide", java.lang.Double.MIN_VALUE, "x", null),
      Row(127L, "one-byte edge", 2.0, "y", Array[Byte](-1)),
      Row(128L, "two-byte edge", 3.0, null, null))
    val path = tmpDb()
    SqliteWriter.write(path, Seq(TableSpec("t", schema, rows)))
    val f = SqliteFile(path)
    val (root, sql) = f.tables("t")
    assert(sql.contains("\"name\" TEXT") && sql.contains("\"score\" REAL")
      && sql.contains("\"blob\" BLOB"))
    val got = f.scanSubtree(root).map(_._2).toVector
    assert(got.length == rows.length)
    // rows come back in rowid (= insertion) order
    rows.zip(got).foreach { case (exp, g) =>
      assert(g(0) == exp.get(0), "id")
      assert(g(1) == exp.get(1), "name")
      val scoreOk = (g(2), exp.get(2)) match { // -0.0 bit-exact
        case (a: Double, b: Double) =>
          java.lang.Double.doubleToLongBits(a) ==
            java.lang.Double.doubleToLongBits(b)
        case (a, b) => a == b
      }
      assert(scoreOk, "score")
      assert(g(3) == exp.get(3), "tag")
      (g(4), exp.get(4)) match {
        case (a: Array[Byte], b: Array[Byte]) =>
          assert(java.util.Arrays.equals(a, b), "blob")
        case (a, b) => assert(a == b, "blob null")
      }
    }
  }

  test("multi-leaf table gets an interior root and full scan-back") {
    val wide = StructType(Seq(
      StructField("k", LongType), StructField("pad", StringType)))
    val rows = (1 to 2000).map(i => Row(i.toLong, "x" * 100))
    val path = tmpDb()
    SqliteWriter.write(path, Seq(TableSpec("big", wide, rows)))
    val f = SqliteFile(path)
    val (root, _) = f.tables("big")
    assert(f.subtrees(root).length > 1, "expected an interior root")
    val got = f.scanSubtree(root).map(_._2(0)).toVector
    assert(got == (1 to 2000).map(_.toLong).toVector)
  }

  test("rowid alias: values become rowids, record stores NULL, and " +
      "the DSv2 read surfaces the alias column") {
    val s2 = StructType(Seq(
      StructField("key", LongType), StructField("v", StringType)))
    val rows = Seq(Row(42L, "a"), Row(7L, "b"), Row(1000000L, "c"))
    val path = tmpDb()
    SqliteWriter.write(path,
      Seq(TableSpec("al", s2, rows, rowidAlias = Some(0))))
    val f = SqliteFile(path)
    val (root, sql) = f.tables("al")
    assert(sql.contains("\"key\" INTEGER PRIMARY KEY"))
    val raw = f.scanSubtree(root).toVector
    assert(raw.map(_._1) == Vector(7L, 42L, 1000000L)) // rowid-sorted
    assert(raw.forall(_._2(0) == null)) // alias slot is NULL on disk
    val df = spark.read.format("graft.sources.sqlite.SqliteSource")
      .option("path", path).option("table", "al").load()
    val back = df.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(back == Set((42L, "a"), (7L, "b"), (1000000L, "c")))
  }

  test("failure contracts: oversized record and duplicate alias rowids") {
    val s2 = StructType(Seq(
      StructField("k", LongType), StructField("v", StringType)))
    val path = tmpDb()
    intercept[IllegalArgumentException] {
      SqliteWriter.write(path,
        Seq(TableSpec("t", s2, Seq(Row(1L, "x" * 5000)))))
    }
    intercept[IllegalArgumentException] {
      SqliteWriter.write(path, Seq(TableSpec("t", s2,
        Seq(Row(5L, "a"), Row(5L, "b")), rowidAlias = Some(0))))
    }
  }

  test("writeSharded: executor-parallel shards union back to the " +
      "input, each shard a real-sqlite-valid single-table db") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_shard").toString
    val df = (1 to 500).map(i => (i.toLong, s"name_$i", i * 0.5))
      .toDF("id", "name", "score").repartition(4)
    SqliteWriter.writeSharded(df, dir, "t", rowidAlias = Some(0))
    val shards = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".db")).sortBy(_.getName)
    assert(shards.length > 1, "expected multiple shards")
    val back = shards.flatMap { f =>
      val sf = SqliteFile(f.getPath)
      val (root, sql) = sf.tables("t")
      assert(sql.contains("\"id\" INTEGER PRIMARY KEY"))
      sf.scanSubtree(root).map { case (rowid, vals) =>
        (rowid, vals(1).asInstanceOf[String],
          vals(2).asInstanceOf[Double])
      }
    }.toSet
    assert(back ==
      (1 to 500).map(i => (i.toLong, s"name_$i", i * 0.5)).toSet)
  }

  test("empty table: a valid single empty leaf that scans to nothing") {
    val s2 = StructType(Seq(StructField("k", LongType)))
    val path = tmpDb()
    SqliteWriter.write(path, Seq(TableSpec("e", s2, Nil)))
    val f = SqliteFile(path)
    val (root, _) = f.tables("e")
    assert(f.scanSubtree(root).isEmpty)
  }
}
