package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Source/sink surface (SURVEY.md §2.1): CSV round-trip with header
  * (S6/S7), JSON-lines source (S1/S2), map-shaped JSON payloads (R3),
  * catalog introspection (S11), malformed-row tolerance. */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("CSV sink + source round-trips with header (S6/S7)") {
    val dir = tmp("graft_csv") + "/strains"
    val df = graft.domain.Emotions.strainsWide(spark, sf)
      .select("strain_id", "strain_name")
    df.write.option("header", "true").mode("overwrite").csv(dir)
    val back = spark.read.option("header", "true")
      .schema("strain_id LONG, strain_name STRING").csv(dir)
    assert(back.orderBy("strain_id").collect().toSeq ==
      df.orderBy("strain_id").collect().toSeq)
  }

  test("JSON-lines sink + source round-trips (S1)") {
    val dir = tmp("graft_json") + "/eps"
    val df = graft.domain.Emotions.episodesWide(spark, sf)
      .select("episode_id", "episode_name", "happy")
    df.write.mode("overwrite").json(dir)
    val back = spark.read
      .schema("episode_id LONG, episode_name STRING, happy DOUBLE").json(dir)
    assert(back.orderBy("episode_id").collect().toSeq ==
      df.orderBy("episode_id").collect().toSeq)
  }

  test("map-shaped strain payload explodes to one row per entry (R3)") {
    val payload =
      """{"afpak": {"id": 1, "race": "hybrid", "flavors": ["Earthy","Pine"]},
        | "gelato": {"id": 2, "race": "indica", "flavors": ["Sweet"]}}"""
        .stripMargin
    val rows = Seq(payload).toDF("json")
      .select(explode(graft.sources.JsonSources.strainMap($"json"))
        .as(Seq("strain_name", "s")))
      .select($"strain_name", $"s.id", $"s.race",
        explode($"s.flavors").as("flavor"))
      .as[(String, Long, String, String)].collect().toSet
    assert(rows == Set(
      ("afpak", 1L, "hybrid", "Earthy"), ("afpak", 1L, "hybrid", "Pine"),
      ("gelato", 2L, "indica", "Sweet")))
  }

  test("malformed JSON records parse to null (PERMISSIVE skip semantics)") {
    val df = Seq("""{"id": 1, "race": "x", "flavors": ["a"]}""", "not json")
      .toDF("payload")
      .select(graft.sources.JsonSources.strainBridge($"payload").as("st"))
    // PERMISSIVE from_json yields a struct of nulls for malformed rows,
    // so the drop-malformed predicate keys on the required field
    assert(df.filter($"st.id".isNotNull).count() == 1)
    assert(df.filter($"st.id".isNull).count() == 1)
  }

  test("catalog introspection lists registered tables (S11)") {
    Tables.nation(spark, sf).createOrReplaceTempView("graft_nation_view")
    val names = spark.catalog.listTables().collect().map(_.name).toSet
    assert(names.contains("graft_nation_view"))
    spark.catalog.dropTempView("graft_nation_view")
  }

  test("DSv2 REST-loop source: key-range partitions, complete key set (S2)") {
    val df = spark.read.format("graft.sources.v2.StrainApiSource")
      .option("keys", 20).option("keysPerPartition", 6).load()
    // partition planning is the fetch-parallelism knob: ceil(20/6) = 4
    // (AQE may coalesce tiny partitions downstream — assert the
    // source's own planning with it off)
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      assert(df.rdd.getNumPartitions == 4)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    val rows = df.select("num").as[Int].collect().sorted
    assert(rows.toSeq == (1 to 20))
    // payloads parse under the shared strain record schema
    val parsed = df.select(
      graft.sources.JsonSources.strainBridge($"payload").as("st"))
    assert(parsed.filter($"st.id".isNull).count() == 0)
  }

  test("events reader normalizes TIMESTAMP(NANOS) to microseconds") {
    val ts = Tables.events(spark, sf).select("ts").schema.head.dataType
    assert(ts == org.apache.spark.sql.types.TimestampType)
  }
}
