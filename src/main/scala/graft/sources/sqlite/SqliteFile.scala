package graft.sources.sqlite

import java.nio.file.{Files, Paths}

/** Minimal read-only SQLite3 file decoder — enough of the public file
  * format (sqlite.org/fileformat2.html) to scan the reference's real
  * warehouse (`510FinalProject.db`, Scraper.py:247-251) without a JDBC
  * driver: database header, table b-trees (leaf + interior pages),
  * varints, the record serial-type codes, rowid-alias columns, and
  * overflow-page payload chains. Index b-trees, WAL, freelists and
  * pointer-map pages are intentionally out of scope (a full scan never
  * touches them on a non-WAL file).
  *
  * The whole file is held as one byte array: SQLite warehouses that
  * arrive as single files are small by definition of the pattern —
  * at 100 TB the corpus is *many* db files (one per shard/export), and
  * the parallelism comes from file × subtree partitioning in the DSv2
  * layer, not from streaming within one file.
  */
final class SqliteFile(bytes: Array[Byte]) {
  require(bytes.length >= 100 &&
    new String(bytes, 0, 15, "US-ASCII") == "SQLite format 3",
    "not a SQLite3 database file")

  /** Page size: 2 bytes big-endian at offset 16; the value 1 encodes
    * 65536. */
  val pageSize: Int = {
    val raw = ((bytes(16) & 0xff) << 8) | (bytes(17) & 0xff)
    if (raw == 1) 65536 else raw
  }
  // spec-legal page sizes only: powers of two in [512, 65536]; a
  // corrupt header otherwise poisons every offset computation below
  require(pageSize >= 512 && pageSize <= 65536 &&
    Integer.bitCount(pageSize) == 1, s"invalid page size $pageSize")
  /** Usable bytes per page (page size minus the per-page reserved
    * region, offset 20). */
  val usable: Int = pageSize - (bytes(20) & 0xff)
  require((bytes(56 + 3) & 0xff) == 1, "only UTF-8 text encoding supported")

  // ---- low-level readers -------------------------------------------------

  /** Corruption contract: a damaged file must surface as an
    * IllegalStateException naming what broke — never a raw
    * out-of-bounds/NPE from a task deep in a 100 TB ingest
    * (CodecFuzzSpec pins this with every-offset mutations). */
  private def chk(cond: Boolean, msg: => String): Unit =
    if (!cond) throw new IllegalStateException(s"corrupt db: $msg")

  private def u8(off: Int): Int = bytes(off) & 0xff
  private def u16(off: Int): Int = (u8(off) << 8) | u8(off + 1)
  private def u32(off: Int): Long =
    (u8(off).toLong << 24) | (u8(off + 1) << 16) | (u8(off + 2) << 8) | u8(off + 3)

  /** Big-endian signed (sign-extended) integer of `len` ∈ {1,2,3,4,6,8}
    * bytes read from `arr` — the one copy of this logic, shared by the
    * record decoder's serial types 1–6. */
  private def sintOf(arr: Array[Byte], off: Int, len: Int): Long = {
    var v: Long = if ((arr(off) & 0x80) != 0) -1L else 0L
    var i = 0
    while (i < len) { v = (v << 8) | (arr(off + i) & 0xff); i += 1 }
    v
  }

  /** Varint over `arr`: up to 9 bytes, 7 bits each except all 8 of the
    * ninth. Returns (value, bytesConsumed). */
  private def varintOf(arr: Array[Byte], off: Int): (Long, Int) = {
    chk(off >= 0 && off < arr.length, s"varint offset $off")
    var v = 0L; var i = 0
    while (i < 8) {
      chk(off + i < arr.length, "truncated varint")
      val b = arr(off + i) & 0xff
      v = (v << 7) | (b & 0x7f)
      i += 1
      if ((b & 0x80) == 0) return (v, i)
    }
    chk(off + 8 < arr.length, "truncated 9-byte varint")
    ((v << 8) | (arr(off + 8) & 0xff), 9)
  }

  private def varint(off: Int): (Long, Int) = varintOf(bytes, off)

  /** Byte offset of page `pageNo` (1-based). Long, NOT Int: a corrupt
    * child/overflow page number around 2^19..2^31 (at 4 KB pages)
    * would wrap an Int multiply to a small or negative base that
    * passes the bounds checks and then throws a raw OOB deep in the
    * scan — the overflow must happen before the comparison, never
    * after. Callers narrow to Int only AFTER checking against
    * `bytes.length` (itself an Int, so a bounded offset always fits). */
  private def pageOff(pageNo: Int): Long = (pageNo - 1).toLong * pageSize

  // ---- b-tree walk -------------------------------------------------------

  private val LeafTable = 13
  private val InteriorTable = 5

  /** (pageType, cellOffsets, rightMostChild) for a b-tree page; page 1
    * hosts the 100-byte db header before its page header. */
  private def pageHeader(pageNo: Int): (Int, IndexedSeq[Int], Int) = {
    chk(pageNo >= 1 && pageOff(pageNo) + pageSize <= bytes.length,
      s"page $pageNo out of file")
    val base = pageOff(pageNo).toInt // bounded above, so it fits an Int
    val hdr = base + (if (pageNo == 1) 100 else 0)
    val typ = u8(hdr)
    val nCells = u16(hdr + 3)
    val headLen = if (typ == InteriorTable) 12 else 8
    chk(hdr + headLen + 2 * nCells <= base + pageSize,
      s"cell-pointer array overruns page $pageNo")
    val cells = (0 until nCells).map { i =>
      val c = base + u16(hdr + headLen + 2 * i)
      chk(c >= base && c < base + pageSize,
        s"cell offset outside page $pageNo")
      c
    }
    val right = if (typ == InteriorTable) u32(hdr + 8).toInt else 0
    (typ, cells, right)
  }

  /** Child page numbers of `root` (the subtree partition grain for the
    * DSv2 reader); a leaf root is its own single "subtree". */
  def subtrees(root: Int): Vector[Int] = {
    val (typ, cells, right) = pageHeader(root)
    if (typ == LeafTable) Vector(root)
    else cells.map(c => u32(c).toInt).toVector :+ right
  }

  /** All (rowid, record-values) rows under page `page` of a TABLE
    * b-tree, in rowid order. */
  def scanSubtree(page: Int): Iterator[(Long, IndexedSeq[Any])] =
    scanSubtree(page, depth = 0)

  private def scanSubtree(page: Int,
                          depth: Int): Iterator[(Long, IndexedSeq[Any])] = {
    // a corrupt child pointer can form a cycle; real b-trees are
    // log-depth, so a generous cap turns runaway recursion into the
    // corruption error instead of a stack overflow
    chk(depth < 64, "b-tree deeper than 64 levels (pointer cycle?)")
    val (typ, cells, right) = pageHeader(page)
    typ match {
      case LeafTable =>
        cells.iterator.map { c =>
          val (payloadLen, n1) = varint(c)
          val (rowid, n2) = varint(c + n1)
          (rowid, decodeRecord(payload(c + n1 + n2, payloadLen)))
        }
      case InteriorTable =>
        (cells.map(c => u32(c).toInt) :+ right).iterator
          .flatMap(scanSubtree(_, depth + 1))
      case other =>
        throw new IllegalStateException(s"unexpected page type $other")
    }
  }

  /** Payload bytes of a leaf-table cell, following the overflow chain
    * when the record exceeds its local share (the X/M/K split of the
    * format spec, §"B-tree Pages"). */
  private def payload(off: Int, len: Long): Array[Byte] = {
    chk(len >= 0 && len <= Int.MaxValue, s"payload length $len")
    val p = len.toInt
    val x = usable - 35
    if (p <= x) {
      chk(off >= 0 && off.toLong + p <= bytes.length,
        "payload overruns file")
      java.util.Arrays.copyOfRange(bytes, off, off + p)
    } else {
      val m = (usable - 12) * 32 / 255 - 23
      val k = m + (p - m) % (usable - 4)
      val local = if (k <= x) k else m
      chk(local >= 0 && off >= 0 &&
        off.toLong + local + 4 <= bytes.length,
        "local payload share overruns file")
      val out = new Array[Byte](p)
      System.arraycopy(bytes, off, out, 0, local)
      var written = local
      var next = u32(off + local).toInt
      var hops = 0
      while (next != 0 && written < p) {
        chk(next >= 1 && pageOff(next) + pageSize <= bytes.length,
          s"overflow page $next out of file")
        chk(hops < bytes.length / pageSize + 1,
          "overflow chain longer than the file (cycle?)")
        val base = pageOff(next).toInt // bounded above, so it fits an Int
        val take = math.min(usable - 4, p - written)
        System.arraycopy(bytes, base + 4, out, written, take)
        written += take
        next = u32(base).toInt
        hops += 1
      }
      chk(written == p, s"short overflow chain: $written of $p bytes")
      out
    }
  }

  /** Record format: varint header size, serial-type varints, then the
    * values back to back. */
  private def decodeRecord(rec: Array[Byte]): IndexedSeq[Any] = {
    val (hdrLen, n0) = varintOf(rec, 0)
    chk(hdrLen >= n0 && hdrLen <= rec.length,
      s"record header length $hdrLen vs ${rec.length} bytes")
    val types = Vector.newBuilder[Long]
    var o = n0
    while (o < hdrLen) { val (t, n) = varintOf(rec, o); types += t; o += n }
    var body = hdrLen.toInt
    types.result().map { t =>
      val (value, size) = decodeValue(rec, body, t)
      body += size
      value
    }
  }

  private def decodeValue(rec: Array[Byte], off: Int, t: Long): (Any, Int) = {
    def bounded(len: Int): Int = {
      chk(len >= 0 && off >= 0 && off + len <= rec.length,
        s"serial type $t needs $len bytes at $off of ${rec.length}")
      len
    }
    t match {
      case 0 => (null, 0)
      case 1 | 2 | 3 | 4 =>
        val len = bounded(t.toInt)
        (sintOf(rec, off, len), len)
      case 5 | 6 =>
        val len = bounded(if (t == 5) 6 else 8)
        (sintOf(rec, off, len), len)
      case 7 =>
        bounded(8)
        var bits = 0L; var i = 0
        while (i < 8) { bits = (bits << 8) | (rec(off + i) & 0xff); i += 1 }
        (java.lang.Double.longBitsToDouble(bits), 8)
      case 8 => (0L, 0)
      case 9 => (1L, 0)
      case n if n >= 12 && n % 2 == 0 =>
        val len = bounded(((n - 12) / 2).toInt)
        (java.util.Arrays.copyOfRange(rec, off, off + len), len)
      case n if n >= 13 =>
        val len = bounded(((n - 13) / 2).toInt)
        (new String(rec, off, len, "UTF-8"), len)
      case other =>
        throw new IllegalStateException(s"unsupported serial type $other")
    }
  }

  // ---- catalog -----------------------------------------------------------

  /** sqlite_master rows: table name → (root page, CREATE TABLE sql). */
  lazy val tables: Map[String, (Int, String)] =
    scanSubtree(1).flatMap { case (_, vals) =>
      // (type, name, tbl_name, rootpage, sql); corrupt master rows
      // can be short — skip rather than index out of bounds
      if (vals.length < 5) None
      else (vals(0), vals(1), vals(3), vals(4)) match {
        case ("table", name: String, root: Long, sql: String) =>
          Some(name -> (root.toInt, sql))
        case _ => None
      }
    }.toMap
}

object SqliteFile {
  def apply(path: String): SqliteFile =
    new SqliteFile(Files.readAllBytes(Paths.get(path)))
}
