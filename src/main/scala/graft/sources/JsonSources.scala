package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON source handling (SURVEY.md S1/S2, R3, J7): the reference
  * consumes two JSON shapes — a MAP keyed by strain name
  * (`weed_API()`, Scraper.py:197-207) and one record per call
  * (episodes, Scraper.py:218-233) — flattening nested arrays into
  * bridge tables (the legacy strain_to_*_table rows, SURVEY.md §1.3).
  *
  * Engine form: `from_json` with an explicit schema (never inferred),
  * `explode` for array→bridge, `explode(map)` for the map shape.
  * PERMISSIVE parsing drops malformed payloads as nulls — the
  * reference's `except: continue` (Scraper.py:407-408).
  */
object JsonSources {

  /** Strain-API record schema (FIXTURES.md A6, minus nesting we don't
    * need for the bridge expansion). */
  val strainSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("race", StringType),
    StructField("flavors", ArrayType(StringType))))

  /** Parse a JSON-record column and explode the flavors array into
    * bridge rows: (strain_id, race, flavor). */
  def strainBridge(json: Column): Column = from_json(json, strainSchema)

  /** Map-shaped payload `{name: {id, race, flavors}}` → one row per
    * entry: (strain_name, strain struct). */
  def strainMap(json: Column): Column =
    from_json(json, MapType(StringType, strainSchema))

  /** Build the strain-API JSON payload from part rows — the in-engine
    * stand-in for the remote GET (zero egress, same shape). */
  def partAsStrainJson(df: DataFrame): DataFrame =
    df.select(
      col("p_partkey"),
      concat(
        lit("""{"id": """), col("p_partkey"),
        lit(""", "race": """"), col("p_brand"), lit("""", "flavors": [""""),
        regexp_replace(col("p_type"), " ", "\",\""),
        lit("\"]}")).as("payload"))
}
