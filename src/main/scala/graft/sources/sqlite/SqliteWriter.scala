package graft.sources.sqlite

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** From-scratch single-file SQLite WRITER — the inverse of
  * [[SqliteFile]], closing the reference round trip: the reference's
  * warehouse is a writable SQLite db (Scraper.py:261,282,313,382
  * CREATE TABLE / INSERT), and until now the engine could read the
  * real `510FinalProject.db` but only write parquet.
  *
  * Emits the database header, a `sqlite_master` table b-tree on page
  * 1, and one table b-tree per table: leaf pages packed greedily in
  * rowid order, interior pages built bottom-up over them (recursing
  * while more than one page remains, so depth grows as needed).
  * Records use the standard serial-type codes the reader decodes:
  * NULL, 1/2/3/4/6/8-byte big-endian signed ints (smallest that
  * fits), IEEE-754 doubles, UTF-8 text, blobs. Schema format 1 is
  * declared, so the 0/1-literal codes 8/9 are never written.
  *
  * Scope mirrors the reader's: no overflow pages (a record larger
  * than one leaf's max payload throws — the reference warehouse rows
  * are far below it), no freelist, no WAL, no indexes. A column may
  * be declared `INTEGER PRIMARY KEY` (rowid alias): its values become
  * the rowids and the record stores NULL in that position, exactly
  * the form [[SqliteSchema.parseCreate]] detects on read.
  *
  * Scale note: a SQLite file is a single-writer container by design —
  * this is a DRIVER-side sink for bounded results (the reference's
  * warehouse tables are scraper output, tens-to-thousands of rows).
  * A 100 TB pipeline would shard via foreachPartition, one db file
  * per partition, using this same page builder per shard. */
object SqliteWriter {
  private val PageSize = 4096
  /** Max direct leaf payload before overflow would be required
    * (usable − 35, the table-leaf threshold from the file format). */
  private val MaxPayload = PageSize - 35

  /** One table to write: name, Spark schema, rows, and optionally the
    * index of a LongType column to declare INTEGER PRIMARY KEY (its
    * values — which must be distinct — become the rowids). */
  final case class TableSpec(name: String, schema: StructType,
                             rows: Seq[Row], rowidAlias: Option[Int] = None)

  // ---- low-level encoders --------------------------------------------------

  private def varint(v: Long): Array[Byte] = {
    if (v >= 0 && v <= 0x7f) return Array(v.toByte)
    // Any value needing more than 56 bits (negatives, and positives
    // >= 2^56) must use the 9-byte form, whose NINTH byte carries all
    // 8 raw bits — eight 7-bit continuation groups followed by a
    // 7-bit tail can only express 56 bits and a spec-correct reader
    // (SqliteFile.varintOf, and sqlite3 itself) would decode it
    // shifted by one bit.
    if (v < 0 || (v >>> 56) != 0) {
      val out = new Array[Byte](9)
      var x = v
      out(8) = (x & 0xff).toByte; x >>= 8
      var i = 7
      while (i >= 0) { out(i) = ((x & 0x7f) | 0x80).toByte; x >>= 7; i -= 1 }
      return out
    }
    var groups = List.empty[Byte]
    var x = v
    while (x != 0) { groups = (x & 0x7f).toByte :: groups; x >>>= 7 }
    groups.zipWithIndex.map { case (b, i) =>
      if (i == groups.length - 1) b else (b | 0x80).toByte
    }.toArray
  }

  private def be(v: Long, len: Int): Array[Byte] = {
    val out = new Array[Byte](len)
    var i = len - 1; var x = v
    while (i >= 0) { out(i) = (x & 0xff).toByte; x >>= 8; i -= 1 }
    out
  }

  private def intBytesNeeded(v: Long): Int =
    if (v >= -128 && v <= 127) 1
    else if (v >= -32768 && v <= 32767) 2
    else if (v >= -8388608 && v <= 8388607) 3
    else if (v >= Int.MinValue && v <= Int.MaxValue) 4
    else if (v >= -140737488355328L && v <= 140737488355327L) 6
    else 8

  private def serialOf(len: Int): Long = len match {
    case 1 => 1; case 2 => 2; case 3 => 3; case 4 => 4
    case 6 => 5; case 8 => 6
  }

  /** (serial type, body bytes) for one value. */
  private def encodeValue(v: Any): (Long, Array[Byte]) = v match {
    case null => (0L, Array.emptyByteArray)
    case b: Boolean => encodeValue(if (b) 1L else 0L)
    case i: Int => encodeValue(i.toLong)
    case l: Long =>
      val n = intBytesNeeded(l); (serialOf(n), be(l, n))
    case f: Float => encodeValue(f.toDouble)
    case d: Double =>
      (7L, be(java.lang.Double.doubleToLongBits(d), 8))
    case s: String =>
      val b = s.getBytes("UTF-8"); (13L + 2L * b.length, b)
    case b: Array[Byte] => (12L + 2L * b.length, b)
    case other => throw new IllegalArgumentException(
      s"unsupported sink value type ${other.getClass.getName}")
  }

  /** SQLite record: varint(header size incl itself) + serial types +
    * bodies. */
  private def record(values: Seq[Any]): Array[Byte] = {
    val enc = values.map(encodeValue)
    val typeBytes = enc.map { case (t, _) => varint(t) }
    // header length includes its own varint; sizes 1..127 self-consistent
    val tlen = typeBytes.map(_.length).sum
    val hdrLen = {
      var h = tlen + 1
      while (varint(h.toLong).length + tlen != h) h += 1
      h
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write(varint(hdrLen.toLong)); typeBytes.foreach(out.write)
    enc.foreach { case (_, b) => out.write(b) }
    out.toByteArray
  }

  // ---- page builders -------------------------------------------------------

  private def u16(page: Array[Byte], off: Int, v: Int): Unit = {
    page(off) = ((v >> 8) & 0xff).toByte; page(off + 1) = (v & 0xff).toByte
  }
  private def u32(page: Array[Byte], off: Int, v: Long): Unit = {
    page(off) = ((v >> 24) & 0xff).toByte
    page(off + 1) = ((v >> 16) & 0xff).toByte
    page(off + 2) = ((v >> 8) & 0xff).toByte
    page(off + 3) = (v & 0xff).toByte
  }

  /** Pack cells into one b-tree page. `hdrBase` is 100 on page 1, 0
    * elsewhere; `right` is the rightmost-child pointer for interior
    * pages. Cells must already be in key order. */
  private def packPage(pageType: Int, hdrBase: Int, cells: Seq[Array[Byte]],
                       right: Int = 0): Array[Byte] = {
    val page = new Array[Byte](PageSize)
    val hdrLen = if (pageType == 0x05) 12 else 8
    page(hdrBase) = pageType.toByte
    u16(page, hdrBase + 1, 0) // no freeblocks
    u16(page, hdrBase + 3, cells.length)
    page(hdrBase + 7) = 0 // no fragmented bytes
    if (pageType == 0x05) u32(page, hdrBase + 8, right.toLong)
    val ptrBase = hdrBase + hdrLen
    // Capacity check BEFORE any copy: the content cursor descends from
    // the page end, so an overfull cell set would first clobber the
    // header/pointer region and only then trip a post-hoc assert.
    val cellBytes = cells.map(_.length).sum
    require(ptrBase + 2 * cells.length + cellBytes <= PageSize,
      s"page overflow: ${cells.length} cells, $cellBytes content bytes, " +
        s"header base $hdrBase")
    var content = PageSize
    cells.zipWithIndex.foreach { case (c, i) =>
      content -= c.length
      System.arraycopy(c, 0, page, content, c.length)
      u16(page, ptrBase + 2 * i, content)
    }
    u16(page, hdrBase + 5, if (content == 65536) 0 else content)
    page
  }

  /** Greedy leaf fill in rowid order. Returns the leaf page images and
    * each leaf's max rowid. */
  private def packLeaves(cells: Seq[(Long, Array[Byte])])
      : (Vector[Array[Byte]], Vector[Long]) = {
    val leaves = Vector.newBuilder[Array[Byte]]
    val maxKeys = Vector.newBuilder[Long]
    var cur = Vector.empty[(Long, Array[Byte])]
    var used = 0
    def flush(): Unit = if (cur.nonEmpty) {
      leaves += packPage(0x0d, 0, cur.map(_._2))
      maxKeys += cur.last._1
      cur = Vector.empty; used = 0
    }
    cells.foreach { case (rowid, c) =>
      val need = c.length + 2 // cell + its pointer slot
      if (used + need > PageSize - 8) flush()
      cur = cur :+ (rowid, c); used += need
    }
    flush()
    (leaves.result(), maxKeys.result())
  }

  /** A table b-tree as page images, pages(0) the root. Interior child
    * pointers are RELATIVE indexes into the returned vector (root = 0,
    * first leaf = 1, …); [[write]] patches them to absolute page
    * numbers once the file layout is known. One interior level max:
    * ~270 leaves × ~35 short rows ≈ 10 k rows/table, far above any
    * reference-warehouse table; larger tables should shard (see the
    * class doc). */
  private def buildBtree(cells: Seq[(Long, Array[Byte])])
      : Vector[Array[Byte]] = {
    if (cells.isEmpty) return Vector(packPage(0x0d, 0, Nil))
    val (leaves, keys) = packLeaves(cells)
    if (leaves.length == 1) return leaves
    // interior cell = [child u32][varint(max rowid in child)]; the
    // last child is the rightmost pointer, not a cell
    val cap = (PageSize - 12) / 15 // 4 B child + ≤9 B varint + 2 B slot
    if (leaves.length > cap + 1)
      throw new IllegalStateException(
        s"table needs ${leaves.length} leaves > 1 interior level " +
          "(the sink is for bounded warehouse tables — shard instead)")
    val rootCells = keys.dropRight(1).zipWithIndex.map { case (k, i) =>
      be(i + 1L, 4) ++ varint(k)
    }
    packPage(0x05, 0, rootCells, right = leaves.length) +: leaves
  }

  /** Rewrite an interior page's child pointers in place: cell i's
    * 4-byte child and the rightmost pointer become `children(i)`
    * (RELATIVE page indexes within the table block; caller adds the
    * table's base page number). */
  private def patchInterior(page: Array[Byte], hdrBase: Int,
                            children: Vector[Int]): Unit = {
    val nCells = ((page(hdrBase + 3) & 0xff) << 8) | (page(hdrBase + 4) & 0xff)
    var i = 0
    while (i < nCells) {
      val ptr = ((page(hdrBase + 12 + 2 * i) & 0xff) << 8) |
        (page(hdrBase + 12 + 2 * i + 1) & 0xff)
      u32(page, ptr, children(i).toLong)
      i += 1
    }
    u32(page, hdrBase + 8, children(nCells).toLong)
  }

  // ---- public API ----------------------------------------------------------

  private def sqlTypeOf(dt: DataType): String = dt match {
    case LongType | IntegerType | ShortType | ByteType | BooleanType =>
      "INTEGER"
    case DoubleType | FloatType => "REAL"
    case StringType => "TEXT"
    case BinaryType => "BLOB"
    case other =>
      throw new IllegalArgumentException(s"unsupported sink type $other")
  }

  def createSql(spec: TableSpec): String = {
    val cols = spec.schema.fields.zipWithIndex.map { case (f, i) =>
      val pk = if (spec.rowidAlias.contains(i)) " PRIMARY KEY" else ""
      s""""${f.name}" ${sqlTypeOf(f.dataType)}$pk"""
    }
    s"""CREATE TABLE "${spec.name}"(${cols.mkString(", ")})"""
  }

  /** Write `tables` as a fresh SQLite database at `path`. */
  def write(path: String, tables: Seq[TableSpec]): Unit = {
    require(tables.nonEmpty, "no tables")
    // build each table's cells (rowid order)
    val tableTrees = tables.map { spec =>
      val alias = spec.rowidAlias
      alias.foreach { i =>
        require(spec.schema.fields(i).dataType == LongType ||
          spec.schema.fields(i).dataType == IntegerType,
          "rowid alias column must be integer-typed")
      }
      val withIds = spec.rows.zipWithIndex.map { case (r, idx) =>
        val rowid = alias match {
          case Some(i) =>
            require(!r.isNullAt(i), "rowid alias value must be non-null")
            r.get(i) match { case l: Long => l; case i2: Int => i2.toLong }
          case None => idx + 1L
        }
        val vals = spec.schema.fields.indices.map { i =>
          if (alias.contains(i)) null // alias column stores NULL
          else if (r.isNullAt(i)) null
          else r.get(i)
        }
        rowid -> record(vals)
      }.sortBy(_._1)
      require(withIds.map(_._1).distinct.length == withIds.length,
        s"duplicate rowids in ${spec.name}")
      withIds.foreach { case (_, rec) =>
        require(rec.length <= MaxPayload,
          s"record exceeds one-page payload in ${spec.name}") }
      val cells = withIds.map { case (rowid, rec) =>
        varint(rec.length.toLong) ++ varint(rowid) ++ rec
      }
      buildBtree(withIds.map(_._1).zip(cells))
    }
    // layout: page 1 = sqlite_master; tables follow contiguously
    var nextPage = 2
    val roots = tableTrees.map { pages =>
      val root = nextPage; nextPage += pages.length; root
    }
    // patch each tree's interior child pointers from relative → absolute
    tableTrees.zip(roots).foreach { case (pages, base) =>
      if ((pages(0)(0) & 0xff) == 0x05) {
        val nCells = ((pages(0)(3) & 0xff) << 8) | (pages(0)(4) & 0xff)
        val children = (1 to nCells + 1).map(rel => base + rel).toVector
        patchInterior(pages(0), 0, children)
      }
    }
    // master rows: (type, name, tbl_name, rootpage, sql)
    val masterCells = tables.zip(roots).zipWithIndex.map {
      case ((spec, root), i) =>
        val rec = record(Seq("table", spec.name, spec.name,
          root.toLong, createSql(spec)))
        require(rec.length <= MaxPayload - 100,
          s"master record too large for page 1: ${spec.name}")
        (i + 1L, varint(rec.length.toLong) ++ varint(i + 1L) ++ rec)
    }
    // sqlite_master lives on the single page 1 here (no overflow/
    // multi-page schema b-tree in this writer's scope): bound the
    // AGGREGATE usage — 100-byte db header + 8-byte page header +
    // 2 bytes/cell pointer + the cells themselves — up front, so the
    // failure is this message instead of header clobbering.
    val masterBytes = masterCells.map(_._2.length).sum
    require(100 + 8 + 2 * masterCells.length + masterBytes <= PageSize,
      s"too many tables for the single-page sqlite_master: " +
        s"${tables.length} tables need $masterBytes cell bytes " +
        s"(limit ${PageSize - 108 - 2 * masterCells.length})")
    val masterPage = packPage(0x0d, hdrBase = 100, masterCells.map(_._2))
    val nPages = 1 + tableTrees.map(_.length).sum
    // 100-byte header
    val hdr = masterPage // page 1 hosts the header in its first 100 bytes
    val magic = "SQLite format 3".getBytes("UTF-8") :+ 0.toByte
    System.arraycopy(magic, 0, hdr, 0, 16)
    u16(hdr, 16, PageSize)
    hdr(18) = 1; hdr(19) = 1 // legacy write/read versions
    hdr(20) = 0 // reserved per page
    hdr(21) = 64; hdr(22) = 32; hdr(23) = 32 // payload fractions
    u32(hdr, 24, 1L) // change counter
    u32(hdr, 28, nPages.toLong)
    u32(hdr, 40, 1L) // schema cookie
    u32(hdr, 44, 1L) // schema format 1
    u32(hdr, 56, 1L) // UTF-8
    u32(hdr, 92, 1L) // version-valid-for = change counter
    u32(hdr, 96, 3045000L)
    val out = new java.io.ByteArrayOutputStream(nPages * PageSize)
    out.write(masterPage)
    tableTrees.foreach(_.foreach(out.write))
    Files.write(Paths.get(path), out.toByteArray)
  }

  /** The 100 TB path made concrete: EXECUTOR-parallel sharded write —
    * one `part-<partition>.db` per non-empty input partition under
    * `dir`, each an independent, fully-valid SQLite database holding
    * `table`, written inside `foreachPartition` (no driver collect,
    * no cross-executor coordination; a shard is the same single-file
    * container SQLite is). Readers union the shards — the exact dual
    * of every multi-file columnar layout Spark already reads. Callers
    * size partitions so a shard's rows fit one interior level
    * (~10 k short rows; `repartition`/`maxRecordsPerFile`-style
    * sizing upstream), which also bounds the per-task buffering this
    * builder does. `rowidAlias` keys must then be unique PER SHARD —
    * globally unique keys (the usual case) trivially satisfy that.
    *
    * Commit protocol: each task writes `part-<pid>.db.tmp-<attempt>`
    * (attempt-unique, so a speculative duplicate never shares a temp
    * file with a live writer) and publishes it with an ATOMIC_MOVE
    * rename — a reader listing `dir` sees either nothing or a complete
    * shard, never torn bytes, and a retried task simply re-publishes
    * over the same final name (idempotent: both attempts carry the
    * same partition's rows).
    *
    * Filesystem assumption: `dir` must be visible to whoever reads the
    * shards. On a real cluster that means a SHARED filesystem (NFS,
    * or a mounted DFS that supports atomic rename); in `local[n]`
    * (this repo's test mode) executor-local disk IS driver-local disk,
    * so a plain path works. Object stores without atomic rename would
    * need a manifest-commit layer instead. */
  def writeSharded(df: org.apache.spark.sql.DataFrame, dir: String,
                   table: String,
                   rowidAlias: Option[Int] = None): Unit = {
    val schema = df.schema
    Files.createDirectories(Paths.get(dir))
    df.foreachPartition { (it: Iterator[Row]) =>
      val rows = it.toVector
      if (rows.nonEmpty) {
        val ctx = org.apache.spark.TaskContext.get()
        val pid = ctx.partitionId()
        val tmp = Paths.get(dir, s"part-$pid.db.tmp-${ctx.taskAttemptId()}")
        // tmp is deleted on ANY exit path (round-13 advisory): a failed
        // or speculative-killed attempt must not leave tmp litter
        // accumulating in the shard dir (readers ignore it, operators
        // do not). After a successful move the delete is a no-op.
        // REPLACE_EXISTING documents the re-publish intent; under
        // ATOMIC_MOVE the javadoc says other options are ignored and
        // replace-on-rename is the POSIX semantics this protocol
        // assumes (see the filesystem note above — object stores need
        // a manifest commit layer anyway).
        try {
          write(tmp.toString,
            Seq(TableSpec(table, schema, rows, rowidAlias)))
          Files.move(tmp, Paths.get(dir, s"part-$pid.db"),
            java.nio.file.StandardCopyOption.ATOMIC_MOVE,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        } finally Files.deleteIfExists(tmp)
        ()
      }
    }
  }
}
