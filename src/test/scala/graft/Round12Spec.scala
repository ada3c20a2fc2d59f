package graft

import java.nio.file.Files

import graft.sources.sqlite.{SqliteFile, SqliteWriter}
import graft.sources.sqlite.SqliteWriter.TableSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-12 pinning specs for the round-11 ADVICE findings on the
  * SQLite writer/reader pair:
  *
  *  1. varint: positives >= 2^56 must use the 9-byte form whose ninth
  *     byte carries 8 raw bits (the 8x7-bit tail silently shifted the
  *     value by one bit — a snowflake-ID rowid alias corrupted the db).
  *  2. SqliteFile.pageOff: Long arithmetic BEFORE the bounds check — a
  *     corrupt child/overflow page number near 2^31 used to Int-wrap
  *     to a small/negative base that passed the check then threw a raw
  *     ArrayIndexOutOfBoundsException.
  *  3. writeSharded: attempt-unique temp file + ATOMIC_MOVE publish
  *     (no torn shards under task retry); no temp litter remains.
  *  4. write(): the single-page sqlite_master aggregate bound fails
  *     with an explicit message BEFORE any header-clobbering copy.
  *
  * The overflow-chain fixture is hand-built: the writer never emits
  * overflow pages (one-page payload cap), so the reader's overflow
  * walk needs a crafted file to be exercised at all.
  */
class Round12Spec extends SparkSpec {

  private def tmpDb(): String =
    Files.createTempDirectory("graft_r12").resolve("t.db").toString

  // ---- 1. varint >= 2^56 ---------------------------------------------------

  test("rowid alias >= 2^56 round-trips exactly (9-byte varint form)") {
    val s = StructType(Seq(
      StructField("key", LongType), StructField("v", StringType)))
    val keys = Seq((1L << 56) - 1, 1L << 56, (1L << 56) + 1,
      (1L << 57) + 123L, (1L << 62) | 0x5aa5_5aa5_5aa5L, Long.MaxValue)
    val rows = keys.map(k => Row(k, s"k=$k"))
    val path = tmpDb()
    SqliteWriter.write(path, Seq(TableSpec("h", s, rows, Some(0))))
    val f = SqliteFile(path)
    val (root, _) = f.tables("h")
    val got = f.scanSubtree(root).map { case (rowid, vals) =>
      (rowid, vals(1)) }.toVector
    assert(got.map(_._1) == keys.sorted.toVector,
      "rowids must survive the 9-byte varint edge bit-exactly")
    got.foreach { case (rowid, v) => assert(v == s"k=$rowid") }
  }

  test("TEXT serial-type varints at the 1->2-byte edge round-trip") {
    // serial type 13+2L crosses the 1->2-byte varint edge at L=58
    // (the 3-byte edge needs L>=8186, beyond the one-page payload cap)
    val s = StructType(Seq(StructField("v", StringType)))
    val rows = Seq(Row("x" * 57), Row("y" * 58), Row("z" * 1000))
    val path = tmpDb()
    SqliteWriter.write(path, Seq(TableSpec("t", s, rows)))
    val f = SqliteFile(path)
    val (root, _) = f.tables("t")
    assert(f.scanSubtree(root).map(_._2(0)).toVector ==
      Vector("x" * 57, "y" * 58, "z" * 1000))
  }

  // ---- 2. pageOff overflow + hand-built overflow-chain fixture ------------

  /** Minimal record encoder (mirror of the file format, not of the
    * writer's private one): one TEXT column. */
  private def textRecord(s: String): Array[Byte] = {
    val body = s.getBytes("UTF-8")
    def varint(v: Long): Array[Byte] = {
      if (v <= 0x7f) Array(v.toByte)
      else {
        var groups = List.empty[Byte]; var x = v
        while (x != 0) { groups = (x & 0x7f).toByte :: groups; x >>>= 7 }
        groups.zipWithIndex.map { case (b, i) =>
          if (i == groups.length - 1) b else (b | 0x80).toByte }.toArray
      }
    }
    val serial = varint(13L + 2L * body.length)
    val hdrLen = 1 + serial.length // its own 1-byte varint + serial
    varint(hdrLen.toLong) ++ serial ++ body
  }

  private def u16(a: Array[Byte], off: Int, v: Int): Unit = {
    a(off) = ((v >> 8) & 0xff).toByte; a(off + 1) = (v & 0xff).toByte
  }
  private def u32(a: Array[Byte], off: Int, v: Long): Unit = {
    a(off) = ((v >> 24) & 0xff).toByte
    a(off + 1) = ((v >> 16) & 0xff).toByte
    a(off + 2) = ((v >> 8) & 0xff).toByte
    a(off + 3) = (v & 0xff).toByte
  }

  /** Hand-build a 4-page, 512-byte-page db whose single table row's
    * payload spills across a 2-page overflow chain. Returns the file
    * bytes and the expected TEXT value. */
  private def overflowDb(): (Array[Byte], String) = {
    val pageSize = 512
    val usable = pageSize // no reserved bytes
    val x = usable - 35 // max direct payload on a table leaf
    // pick L so the record is exactly 1200 bytes: 3-byte header + text
    val text = "a" * 1197
    val rec = textRecord(text)
    assert(rec.length == 1200 && rec.length > x)
    val m = (usable - 12) * 32 / 255 - 23
    val k = m + (rec.length - m) % (usable - 4)
    val local = if (k <= x) k else m
    val file = new Array[Byte](4 * pageSize)
    // --- db header on page 1
    val magic = "SQLite format 3".getBytes("US-ASCII") :+ 0.toByte
    System.arraycopy(magic, 0, file, 0, 16)
    u16(file, 16, pageSize)
    file(18) = 1; file(19) = 1
    file(20) = 0 // reserved per page
    file(21) = 64; file(22) = 32; file(23) = 32
    u32(file, 28, 4L) // page count
    u32(file, 44, 1L) // schema format
    u32(file, 56, 1L) // UTF-8
    // --- page 1: sqlite_master leaf with one 'table' row -> root page 2
    val masterRec = {
      // record (type,name,tbl_name,rootpage,sql) with string/int codes
      def txt(s: String) = (13L + 2L * s.getBytes("UTF-8").length,
        s.getBytes("UTF-8"))
      val cols = Seq(txt("table"), txt("t"), txt("t"),
        (1L, Array(2.toByte)), txt("CREATE TABLE \"t\"(\"v\" TEXT)"))
      val serials = cols.map(_._1)
      // all serial varints here are 1 byte (< 128)
      assert(serials.forall(_ < 128))
      val hdr = (1 + serials.length).toByte +: serials.map(_.toByte)
      (hdr ++ cols.flatMap(_._2)).toArray
    }
    val masterCell =
      Array(masterRec.length.toByte, 1.toByte) ++ masterRec // len,rowid<128
    file(100) = 0x0d
    u16(file, 103, 1) // one cell
    val mOff = pageSize - masterCell.length
    System.arraycopy(masterCell, 0, file, mOff, masterCell.length)
    u16(file, 105, mOff)
    u16(file, 108, mOff) // cell pointer
    // --- page 2: table leaf, one cell with overflow to pages 3,4
    val p2 = pageSize
    // payload-len varint for 1200 = 2 bytes (0x89 0x30), rowid 1 = 1 byte
    val lenVarint = Array((0x80 | (1200 >> 7)).toByte, (1200 & 0x7f).toByte)
    val cell = lenVarint ++ Array(1.toByte) ++ rec.take(local) ++ {
      val ov = new Array[Byte](4); u32(ov, 0, 3L); ov } // first overflow pg
    file(p2) = 0x0d
    u16(file, p2 + 3, 1)
    val cOff = pageSize - cell.length
    System.arraycopy(cell, 0, file, p2 + cOff, cell.length)
    u16(file, p2 + 5, cOff)
    u16(file, p2 + 8, cOff)
    // --- pages 3..4: overflow chain
    var written = local
    var pg = 3
    while (written < rec.length) {
      val base = (pg - 1) * pageSize
      val take = math.min(usable - 4, rec.length - written)
      val next = if (written + take < rec.length) pg + 1 else 0
      u32(file, base, next.toLong)
      System.arraycopy(rec, written, file, base + 4, take)
      written += take; pg += 1
    }
    (file, text)
  }

  test("hand-built overflow chain scans back the full payload") {
    val (bytes, text) = overflowDb()
    val f = new SqliteFile(bytes)
    val (root, sql) = f.tables("t")
    assert(root == 2 && sql.contains("\"v\" TEXT"))
    val rows = f.scanSubtree(root).toVector
    assert(rows == Vector((1L, Vector(text))))
  }

  test("corrupt overflow/child page numbers near 2^31 surface as the " +
      "corruption error, never a raw out-of-bounds") {
    val (bytes, _) = overflowDb()
    val f0 = new SqliteFile(bytes)
    val (root, _) = f0.tables("t")
    // the first-overflow-page u32 sits 4 bytes before the cell's end;
    // rather than recompute, corrupt EVERY u32-aligned offset on page 2
    // with page numbers that Int-wrap at 512-byte pages (>= 2^23) and
    // demand the total contract
    val hostile = Seq(0x00800000L, 0x7fffffffL, 0x80000001L, 0xfffffff0L)
    for (off <- 512 until 1024 by 4; v <- hostile) {
      val m = bytes.clone()
      u32(m, off, v)
      try {
        val f = new SqliteFile(m)
        f.tables.values.foreach { case (r, _) => f.scanSubtree(r).length }
      } catch {
        case _: IllegalStateException | _: IllegalArgumentException => ()
        case e: Throwable =>
          fail(s"raw ${e.getClass.getSimpleName} at off=$off v=$v: " +
            e.getMessage)
      }
    }
    // same contract for a corrupt INTERIOR child pointer: build a
    // multi-leaf table and smash the root's child u32s
    val s = StructType(Seq(
      StructField("k", LongType), StructField("pad", StringType)))
    val path = tmpDb()
    SqliteWriter.write(path,
      Seq(TableSpec("big", s, (1 to 2000).map(i => Row(i.toLong, "x" * 100)))))
    val valid = Files.readAllBytes(java.nio.file.Paths.get(path))
    val f1 = new SqliteFile(valid)
    val (bigRoot, _) = f1.tables("big")
    assert(f1.subtrees(bigRoot).length > 1)
    val rootBase = (bigRoot - 1) * 4096
    for (off <- rootBase until rootBase + 4096 by 8; v <- hostile) {
      val m = valid.clone()
      u32(m, off, v)
      try {
        val f = new SqliteFile(m)
        f.tables.values.foreach { case (r, _) => f.scanSubtree(r).length }
      } catch {
        case _: IllegalStateException | _: IllegalArgumentException => ()
        case e: Throwable =>
          fail(s"raw ${e.getClass.getSimpleName} at root off=$off v=$v: " +
            e.getMessage)
      }
    }
  }

  test("overflow-chain fixture is fuzz-total under every-offset mutation") {
    val (valid, _) = overflowDb()
    val r = new scala.util.Random(17L)
    var n = 0
    valid.indices.foreach { i =>
      val m = valid.clone(); m(i) = r.nextInt(256).toByte
      try {
        val f = new SqliteFile(m)
        f.tables.values.foreach { case (root, _) =>
          f.scanSubtree(root).length }
        n += 1
      } catch {
        case _: IllegalStateException | _: IllegalArgumentException => n += 1
        case e: Throwable =>
          fail(s"SqliteFile threw raw ${e.getClass.getSimpleName} at " +
            s"offset $i: ${e.getMessage}")
      }
    }
    assert(n == valid.length)
  }

  // ---- 3. writeSharded commit protocol -------------------------------------

  test("writeSharded leaves no temp files and republishing over " +
      "existing shards succeeds (task-retry idempotence)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_r12s").toString
    val df = (1 to 300).map(i => (i.toLong, s"n$i"))
      .toDF("id", "name").repartition(3)
    SqliteWriter.writeSharded(df, dir, "t", rowidAlias = Some(0))
    // second run = the retry shape: same partitions, same final names
    SqliteWriter.writeSharded(df, dir, "t", rowidAlias = Some(0))
    val files = new java.io.File(dir).listFiles().map(_.getName).toVector
    assert(files.nonEmpty && files.forall(_.matches("part-\\d+\\.db")),
      s"unexpected files after publish: $files")
    val back = files.flatMap { name =>
      val f = SqliteFile(s"$dir/$name")
      val (root, _) = f.tables("t")
      f.scanSubtree(root).map { case (rowid, v) => (rowid, v(1)) }
    }.toSet
    assert(back == (1 to 300).map(i => (i.toLong, s"n$i")).toSet)
  }

  test("writeSharded at scale: 120k rows across 16 shards round-trip " +
      "with full per-shard structural integrity") {
    import spark.implicits._
    val n = 120000
    val dir = Files.createTempDirectory("graft_r12big").toString
    val df = spark.range(1, n + 1)
      .select(col("id"), concat(lit("name_"), col("id")).as("name"),
        (col("id") % 997).cast("double").as("score"))
      .repartition(16)
    SqliteWriter.writeSharded(df, dir, "t", rowidAlias = Some(0))
    val shards = new java.io.File(dir).listFiles().sortBy(_.getName)
    assert(shards.length == 16 &&
      shards.forall(_.getName.matches("part-\\d+\\.db")))
    // parallel re-read: the DSv2 source unions the shards — the exact
    // read shape the 100 TB path uses
    val back = shards.map { f =>
      spark.read.format("graft.sources.sqlite.SqliteSource")
        .option("path", f.getPath).option("table", "t").load()
    }.reduce(_.unionByName(_))
    val counts = back.agg(count(lit(1)), sum(col("id")),
      sum(col("score"))).head
    assert(counts.getLong(0) == n.toLong)
    assert(counts.getLong(1) == n.toLong * (n + 1) / 2)
    // structural integrity per shard: every b-tree walks fully, rowid
    // order strict within each leaf walk, multi-leaf roots present
    shards.foreach { f =>
      val sf = SqliteFile(f.getPath)
      val (root, _) = sf.tables("t")
      assert(sf.subtrees(root).length > 1,
        s"${f.getName}: 7.5k rows must need an interior root")
      val ids = sf.scanSubtree(root).map(_._1).toVector
      assert(ids == ids.sorted && ids.distinct.length == ids.length,
        s"${f.getName}: rowid order broken")
    }
  }

  // ---- plan-shape tripwires for the local-kernel sweep ----------------------

  test("plan shapes: the per-doc/per-word kernels stay shuffle-free " +
      "(bwt, LZ parse, tokenizer DP, span matching)") {
    import spark.implicits._
    val docs = Seq((1L, "a b a b c a b"), (2L, "x y x y x y"))
      .toDF("doc_id", "text")
    def exchanges(df: org.apache.spark.sql.DataFrame): Int = {
      val p = df.queryExecution.executedPlan.toString
      p.sliding("Exchange".length).count(_ == "Exchange")
    }
    // bwt: one map over the checkpointed tokenized corpus — no
    // exchange before the per-doc suffix sort (the plan's only
    // exchanges belong to the consumer, none here)
    val vocab = operators.UnigramSegment.pieceVocab(docs, "text")
      .localCheckpoint() // isolate the DP stage from the vocab build
    val seg = operators.UnigramSegment
      .viterbiSegment(docs, "text", vocab)
    // distinct-words is one exchange; the DP itself adds none
    assert(exchanges(seg) <= 1,
      s"viterbi DP must not join/window:\n" +
        seg.queryExecution.executedPlan.toString)
    val gre = operators.UnigramSegment
      .greedySegment(docs, "text", vocab)
    assert(exchanges(gre) <= 1, "greedy DP must not join/window")
    val lz = operators.Lz.lzFactors(docs, "doc_id", "text")
    assert(exchanges(lz) == 0,
      s"LZ parse is map-only:\n" +
        lz.queryExecution.executedPlan.toString)
    val plans = Seq(seg, gre, lz).map(
      _.queryExecution.executedPlan.toString)
    assert(plans.forall(_.contains("SerializeFromObject")),
      "expected the typed local kernel (object island) in every plan")
  }

  // ---- CREATE TABLE parser fuzz ----------------------------------------------

  test("SqliteSchema.parseCreate is fuzz-total: mutated/hostile SQL " +
      "parses or fails with the explicit error, never a raw throw") {
    import graft.sources.sqlite.SqliteSchema
    val valid = """CREATE TABLE "t"("id" INTEGER PRIMARY KEY, """ +
      """"name" TEXT, [sp ace] REAL, `bt` BLOB, plain, """ +
      """PRIMARY KEY (id))"""
    val r = new scala.util.Random(122L)
    val muts = valid.indices.map { i =>
      val a = valid.toCharArray; a(i) = (32 + r.nextInt(95)).toChar
      new String(a)
    }
    val crafted = Seq(
      "", "CREATE TABLE t", "CREATE TABLE t()", "()", "(,)",
      "CREATE TABLE t(\"unterminated", "CREATE TABLE t([open",
      "CREATE TABLE t(a,,b)", "CREATE TABLE t(PRIMARY KEY)",
      "CREATE TABLE t(PRIMARY KEY ())", "not sql at all",
      "CREATE TABLE t(a INTEGER PRIMARY KEY DESC)",
      "CREATE TABLE t" + "(" * 50, "CREATE TABLE t(a" + ")" * 50)
    (muts ++ crafted).foreach { s =>
      try { SqliteSchema.parseCreate(s); () }
      catch {
        case _: IllegalArgumentException | _: IllegalStateException => ()
        case e: Throwable =>
          fail(s"parseCreate threw raw ${e.getClass.getSimpleName} " +
            s"on: $s")
      }
    }
    // the valid statement still parses to the expected shape
    val cols = SqliteSchema.parseCreate(valid)
    assert(cols.map(_.name) ==
      Seq("id", "name", "sp ace", "bt", "plain"))
    assert(cols.head.rowidAlias)
  }

  // ---- SQ8 recall audit (q348) ----------------------------------------------

  test("sq8Recall: lossless on grid-aligned vectors, total on a " +
      "degenerate constant dimension, overlap bounded by k") {
    import spark.implicits._
    // values are multiples of 1/16 -> exactly representable on the
    // 2^16 grid AND the 255-step per-dim scale loses nothing that
    // changes any ranking; dim 3 is constant (hi == lo, span guard)
    val vecs = (0L until 40L).map { i =>
      (i, Array((i % 7).toFloat / 16f, (i % 5).toFloat / 16f,
        ((i * 3) % 11).toFloat / 16f, 0.25f))
    }.toDF("vec_id", "embedding")
    val r = operators.Similarity.sq8Recall(vecs, k = 3, queryMod = 10)
      .collect()
    assert(r.length == 4) // queries 0, 10, 20, 30
    r.foreach { row =>
      val ov = row.getLong(1)
      assert(ov >= 0 && ov <= 3)
      assert(row.getLong(2) == ov * 1000000L / 3)
    }
    // grid-aligned + coarse integer ranks: SQ8 must not lose recall
    // on ties broken identically (both rankings use (s desc, cid asc))
    assert(r.map(_.getLong(1)).sum >= 8,
      s"grid-aligned vectors should keep near-perfect recall: " +
        r.map(_.getLong(1)).mkString(","))
  }

  // ---- cross-run incrementality family (q345–q347) -------------------------

  test("crawl-snapshot family: diff classes partition the key space " +
      "and the store merge is consistent with the diff") {
    val diff = SparkEntry.queries("q345_snapshot_fp_diff")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // fixture law: added = doc_id % 7 == 3; removed = retired ids
    // >= 1000000; changed = % 11 == 0 among docs present both days
    diff.foreach { case (id, ct) =>
      val expected =
        if (id >= 1000000L) "removed"
        else if (id % 7 == 3) "added"
        else if (id % 11 == 0) "changed"
        else fail(s"doc $id should be unchanged, diff says $ct")
      assert(ct == expected, s"doc $id: $ct != $expected")
    }
    val store = SparkEntry.queries("q347_fp_store_merge")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(store.keys.forall(_ < 1000000L), "removed keys must drop")
    store.foreach { case (id, run) =>
      val touched = diff.get(id).exists(c => c == "added" || c == "changed")
      assert(run == (if (touched) 2L else 1L),
        s"doc $id: run $run vs diff ${diff.get(id)}")
    }
    // the delta-dedup batch is exactly the added+changed set
    val dd = SparkEntry.queries("q346_delta_dedup")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val delta = diff.collect {
      case (id, ct) if ct == "added" || ct == "changed" => id }.toSet
    assert(dd == delta)
  }

  // ---- 4. single-page sqlite_master aggregate bound -------------------------

  test("too many tables fails with the explicit master-page message, " +
      "not header clobbering") {
    val s = StructType(Seq(StructField("k", LongType)))
    // each master row is ~60 bytes; 120 tables overflow page 1's ~3988
    val many = (1 to 120).map(i =>
      TableSpec(f"table_with_a_reasonably_long_name_$i%03d", s, Nil))
    val e = intercept[IllegalArgumentException] {
      SqliteWriter.write(tmpDb(), many)
    }
    assert(e.getMessage.contains("single-page sqlite_master"),
      s"wrong failure: ${e.getMessage}")
  }
}
