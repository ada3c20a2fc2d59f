package graft

import org.apache.spark.sql.functions._
import graft.sources.sqlite.{SqliteFile, SqliteSchema, SqliteSource}

/** The native SQLite reader against the reference's REAL warehouse
  * (`510FinalProject.db`) — catalog walk, leaf + interior b-tree
  * pages, rowid-alias columns, affinity coercion, subtree
  * partitioning, and column pruning. Expected values were extracted
  * with an independent reader and frozen as literals. */
class SqliteSourceSpec extends SparkSpec {
  import spark.implicits._

  private val db = SqliteFile(SqliteSource.referenceDbPath)

  private def tbl(name: String) =
    spark.read.format("graft.sources.sqlite.SqliteSource")
      .option("path", SqliteSource.referenceDbPath)
      .option("table", name).load()

  test("catalog: every reference table visible with a root page") {
    val names = db.tables.keySet
    assert(names.contains("episode_table"))
    assert(names.contains("strain_to_positive_table"))
    assert(names.contains("sqlite_sequence"))
    assert(names.size == 14)
  }

  test("CREATE TABLE parser: affinities, rowid aliases, dump quirks") {
    val cols = SqliteSchema.parseCreate(
      "CREATE TABLE episode_emotion_table (episode_id INTEGER, " +
        "happy_id INTEGER, happy real,angry_id INTEGER, angry real," +
        "bored_id INTEGER, bored real,fear_id INTEGER, fear real," +
        "sad_id INTEGER, sad real, excited_id INTEGER,excited real)")
    assert(cols.map(_.name) == Seq("episode_id", "happy_id", "happy",
      "angry_id", "angry", "bored_id", "bored", "fear_id", "fear",
      "sad_id", "sad", "excited_id", "excited"))
    assert(cols.find(_.name == "happy").get.affinity == 'r')   // lowercase
    assert(cols.find(_.name == "excited").get.affinity == 'r') // no space
    val pk = SqliteSchema.parseCreate(
      "CREATE TABLE t (name TEXT, id INTEGER PRIMARY KEY)")
    assert(pk.find(_.name == "id").get.rowidAlias)
    assert(!pk.find(_.name == "name").get.rowidAlias)
  }

  test("rowid-alias columns carry the b-tree key, not the stored NULL") {
    val eps = tbl("episode_table").orderBy("episode_id").collect()
    assert(eps.length == 41)
    assert(eps.head.getLong(0) == 1L && eps.head.getString(1) == "Pilot")
    assert(eps.last.getLong(0) == 41L &&
      eps.last.getString(1) == "Star Mort Rickturn of the Jerri")
    // ids are the full 1..41 range — nulls would break the sum
    assert(eps.map(_.getLong(0)).sum == 861L)
  }

  test("interior b-tree pages: the 9286-row bridge table decodes fully") {
    assert(db.subtrees(db.tables("strain_to_positive_table")._1).size > 1,
      "expected a multi-page b-tree (one partition per subtree)")
    val agg = tbl("strain_to_positive_table")
      .agg(count(lit(1)), sum($"strain_id"),
        sum(length($"pos_effect_name"))).collect().head
    assert(agg.getLong(0) == 9286L)
    assert(agg.getLong(1) == 10251212L)
    assert(agg.getLong(2) == 65096L)
  }

  test("REAL affinity: stored doubles and int-optimized reals coerce") {
    val q = tbl("strain_review_table")
      .agg(sum(floor($"happy" * 1024) + floor($"angry" * 1024) +
        floor($"bored" * 1024) + floor($"fear" * 1024) +
        floor($"sad" * 1024) + floor($"excited" * 1024))).collect().head
    assert(q.getLong(0) == 77029L)
  }

  test("empty tables scan to zero rows without errors") {
    assert(tbl("strain_id_table").count() == 0L)
    assert(tbl("test_table").count() == 0L)
  }

  test("column pruning reaches the scan") {
    val pruned = tbl("strain_to_positive_table").select("strain_id")
    assert(pruned.schema.fieldNames.toSeq == Seq("strain_id"))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("strain_id"))
    assert(pruned.distinct().count() > 1000)
    // partition fan-out: the big table splits across subtrees
    assert(pruned.rdd.getNumPartitions > 1)
  }
}
