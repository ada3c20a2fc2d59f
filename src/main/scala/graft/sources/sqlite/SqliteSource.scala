package graft.sources.sqlite

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** One column of a SQLite table: declared name, type AFFINITY (SQLite
  * columns are dynamically typed; the affinity — §3.1 of the datatype
  * doc — is what a reader should coerce toward), and whether the
  * column is an `INTEGER PRIMARY KEY` rowid alias (stored as NULL in
  * the record; the real value is the b-tree rowid key). */
case class SqliteColumn(name: String, affinity: Char, rowidAlias: Boolean) {
  def sparkType: DataType = affinity match {
    case 'i' => LongType
    case 'r' | 'n' => DoubleType
    case 't' => StringType
    case _ => BinaryType
  }
}

object SqliteSchema {
  /** Column list from a CREATE TABLE statement — names, affinities,
    * rowid-alias flags. Handles the reference dump's quirks (lowercase
    * `real`, missing spaces after commas), quoted identifiers
    * (including embedded spaces), and BOTH rowid-alias spellings:
    * a column typed exactly INTEGER with a column-level PRIMARY KEY
    * (not DESC), or named by a table-level `PRIMARY KEY (col)` —
    * the two forms §"ROWIDs and the INTEGER PRIMARY KEY" defines.
    * A column typed `INT` (or any other INT-affinity spelling that is
    * not the literal word INTEGER) is NOT an alias: its stored values
    * are real. */
  def parseCreate(sql: String): Seq[SqliteColumn] = {
    // corruption contract (the SqliteFile chk convention): hostile or
    // damaged sqlite_master SQL must surface as IllegalArgumentException
    // naming the problem, never a raw StringIndexOutOfBounds/NoSuchElement
    def bad(msg: String): Nothing =
      throw new IllegalArgumentException(s"unsupported CREATE TABLE: $msg")
    val open = sql.indexOf('(')
    val closeIdx = sql.lastIndexOf(')')
    if (open < 0 || closeIdx <= open) bad("no parenthesized column list")
    val body = sql.substring(open + 1, closeIdx)
    // split on top-level commas only (parens can nest in constraints)
    val defs = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0; var start = 0
    body.zipWithIndex.foreach {
      case ('(', _) => depth += 1
      case (')', _) => depth -= 1
      case (',', i) if depth == 0 => defs += body.substring(start, i); start = i + 1
      case _ =>
    }
    defs += body.substring(start)
    val constraintKw =
      Set("PRIMARY", "UNIQUE", "CHECK", "FOREIGN", "CONSTRAINT")
    // identifier + the text after it, honoring "..."/[...]/`...` quoting
    def splitName(d: String): (String, String) = {
      if (d.isEmpty) bad("empty column definition")
      d.head match {
        case '"' | '`' =>
          val close = d.indexOf(d.head, 1)
          if (close < 0) bad("unterminated quoted identifier")
          (d.substring(1, close), d.substring(close + 1))
        case '[' =>
          val close = d.indexOf(']', 1)
          if (close < 0) bad("unterminated [identifier]")
          (d.substring(1, close), d.substring(close + 1))
        case _ =>
          val name = d.takeWhile(c => !c.isWhitespace)
          (name, d.drop(name.length))
      }
    }
    // table-level `PRIMARY KEY (col)` names a rowid alias when that
    // column's type is exactly INTEGER
    val tablePk: Option[String] = defs.map(_.trim)
      .filter(d => d.toUpperCase.startsWith("PRIMARY"))
      .flatMap { d =>
        // a malformed table-level PRIMARY KEY (no parens / empty) is
        // not an alias declaration we recognize — ignore, don't throw
        val po = d.indexOf('('); val pc = d.lastIndexOf(')')
        if (po < 0 || pc <= po) None
        else {
          val inner = d.substring(po + 1, pc).trim
          if (inner.isEmpty) None else Some(splitName(inner)._1)
        }
      }.headOption
    defs.toSeq.map(_.trim).filter(_.nonEmpty).flatMap { d =>
      val (name, after) = splitName(d)
      if (constraintKw.contains(name.toUpperCase)) None
      else {
        val rest = after.trim.toUpperCase
        val typ = rest.takeWhile(c => !",(".contains(c))
          .split("\\s+").takeWhile(w =>
            !Set("PRIMARY", "NOT", "NULL", "UNIQUE", "DEFAULT", "CHECK",
              "REFERENCES", "COLLATE", "GENERATED", "AS").contains(w))
          .mkString(" ")
        val aff =
          if (typ.contains("INT")) 'i'
          else if (typ.contains("CHAR") || typ.contains("CLOB") ||
            typ.contains("TEXT")) 't'
          else if (typ.isEmpty || typ.contains("BLOB")) 'b'
          else if (typ.contains("REAL") || typ.contains("FLOA") ||
            typ.contains("DOUB")) 'r'
          else 'n'
        val integerExactly = typ == "INTEGER"
        val columnPk =
          rest.contains("PRIMARY KEY") && !rest.contains("PRIMARY KEY DESC")
        Some(SqliteColumn(name, aff,
          integerExactly && (columnPk || tablePk.contains(name))))
      }
    }
  }

  def toStruct(cols: Seq[SqliteColumn]): StructType =
    StructType(cols.map(c => StructField(c.name, c.sparkType)))
}

/** DataSource V2 connector for SQLite files — the S5 "table scan"
  * operator pointed at the reference's REAL warehouse artifact
  * (`spark.read.format("graft.sources.sqlite.SqliteSource")
  * .option("path", …).option("table", …)`), built on [[SqliteFile]]
  * because the zero-egress sandbox has no JDBC driver jar for SQLite.
  *
  * Scale shape: one `InputPartition` per top-level b-tree subtree of
  * the table's root page (a leaf root = one partition), so a large
  * table fans out across executors without any single reader walking
  * the whole tree; each reader re-opens the file locally — the 100 TB
  * regime is many shard files, where this same planner yields
  * (files × subtrees) partitions. Column pruning is pushed into the
  * scan: pruned columns are never converted, and the record decoder's
  * sequential walk is the irreducible cost of SQLite's record format.
  */
class SqliteSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val (path, table) = SqliteSource.pathTable(options)
    val db = SqliteFileCache.get(path)
    val (_, sql) = db.tables(table)
    SqliteSchema.toStruct(SqliteSchema.parseCreate(sql))
  }
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val (path, table) = SqliteSource.pathTable(opts)
    new SqliteTable(path, table)
  }
}

object SqliteSource {
  /** The reference's shipped warehouse (SURVEY.md §1.2-1.3). Override
    * with GRAFT_SQLITE_DB when the artifact lives elsewhere. */
  val referenceDbPath: String =
    sys.env.getOrElse("GRAFT_SQLITE_DB", "/root/reference/510FinalProject.db")

  private[sqlite] def pathTable(opts: CaseInsensitiveStringMap): (String, String) = {
    val path = opts.get("path")
    val table = opts.get("table")
    require(path != null && table != null,
      "sqlite source needs options path and table")
    (path, table)
  }
}

class SqliteTable(path: String, table: String)
    extends Table with SupportsRead {
  private val db = SqliteFileCache.get(path)
  private val (root, createSql) = db.tables(table)
  private val cols = SqliteSchema.parseCreate(createSql)

  override def name(): String = s"sqlite($table)"
  override def schema(): StructType = SqliteSchema.toStruct(cols)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch
        with SupportsPushDownRequiredColumns {
      private var required: StructType = SqliteTable.this.schema()
      override def pruneColumns(requiredSchema: StructType): Unit =
        required = requiredSchema
      override def build(): Scan = this
      override def readSchema(): StructType = required
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] =
        db.subtrees(root).map { pg =>
          SqliteSubtreePartition(path, pg, cols,
            required.fieldNames.toSeq): InputPartition
        }.toArray
      override def createReaderFactory(): PartitionReaderFactory =
        new SqliteReaderFactory
    }
}

/** One b-tree subtree of one db file = one scan partition. */
case class SqliteSubtreePartition(path: String, page: Int,
                                  cols: Seq[SqliteColumn],
                                  required: Seq[String]) extends InputPartition

class SqliteReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val sp = p.asInstanceOf[SqliteSubtreePartition]
    val picked = sp.required.map(n => sp.cols.indexWhere(_.name == n))
    new PartitionReader[InternalRow] {
      private val it = SqliteFileCache.get(sp.path).scanSubtree(sp.page)
      private var row: InternalRow = _
      override def next(): Boolean = {
        if (!it.hasNext) return false
        val (rowid, vals) = it.next()
        row = InternalRow.fromSeq(picked.map { i =>
          val c = sp.cols(i)
          val raw = if (c.rowidAlias) rowid
            else if (i < vals.length) vals(i) else null
          SqliteReaderFactory.coerce(raw, c)
        })
        true
      }
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }
}

object SqliteReaderFactory {
  /** Coerce a dynamically-typed stored value toward the column's
    * affinity — notably SQLite's disk optimization of writing
    * fraction-free REALs as integers, and integer-typed text. */
  private[sqlite] def coerce(raw: Any, c: SqliteColumn): Any = (raw, c.affinity) match {
    case (null, _) => null
    case (v: Long, 'i') => v
    case (s: String, 'i') => s.toLongOption.orNull
    case (d: Double, 'i') => d.toLong
    case (v: Long, 'r' | 'n') => v.toDouble
    case (d: Double, 'r' | 'n') => d
    case (s: String, 'r' | 'n') => s.toDoubleOption.orNull
    case (s: String, 't') => UTF8String.fromString(s)
    case (v: Long, 't') => UTF8String.fromString(v.toString)
    case (d: Double, 't') => UTF8String.fromString(d.toString)
    // TEXT affinity stores blobs unchanged — surface the bytes as a
    // string rather than silently nulling a legal stored value
    case (b: Array[Byte], 't') => UTF8String.fromBytes(b)
    case (b: Array[Byte], 'b') => b
    case (other, 'b') => other.toString.getBytes("UTF-8")
    // remaining combinations (blob under INTEGER/REAL affinity) have
    // no faithful numeric reading; null is the documented fallback
    case _ => null
  }
}

/** Process-level cache of decoded db files: every subtree partition
  * of every scan on an executor shares ONE in-memory copy per (path,
  * mtime) instead of re-reading the file per task — a 50-partition
  * scan of one shard costs one file read per executor, not fifty.
  * Entries are invalidated by mtime (SQLite files are immutable
  * export artifacts in this pipeline, but a rewritten shard must not
  * serve stale pages). */
object SqliteFileCache {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), SqliteFile]()
  def get(path: String): SqliteFile = {
    val mtime = new java.io.File(path).lastModified()
    cache.computeIfAbsent((path, mtime), _ => SqliteFile(path))
  }
}
