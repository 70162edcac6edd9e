package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semi-structured extraction: typed projection out of a JSON string column
  * — the event-pipeline step that turns a free-form `props` payload into
  * queryable columns before aggregation.
  *
  * The schema is EXPLICIT (DDL string), so the parse is a single codegen'd
  * `from_json` per row inside the scan stage: no schema inference pass over
  * the data (a full extra scan at 100 TB), no per-field re-parse the way
  * chained `get_json_object` calls would, and malformed rows surface as
  * typed nulls instead of failing the job (PERMISSIVE mode).
  */
object SemiStructured {

  /** Flatten `jsonCol` into top-level typed columns per `ddl` (e.g.
    * `"k INT, tag STRING"`), dropping the raw string. Extracted field
    * names must not collide with the retained input columns — that would
    * produce a frame with duplicate names that only fails downstream at
    * first reference (AMBIGUOUS_REFERENCE), so it is rejected up front.
    */
  def extractJson(df: DataFrame, jsonCol: String, ddl: String): DataFrame = {
    val fields = org.apache.spark.sql.types.StructType.fromDDL(ddl).fieldNames
    val kept = df.columns.filter(_ != jsonCol)
    val clash = fields.toSet.intersect(kept.toSet)
    require(clash.isEmpty,
      s"JSON fields collide with input columns: ${clash.mkString(", ")}")
    require(!kept.contains("__j"), "input already has a __j column")
    df.withColumn("__j", from_json(col(jsonCol), ddl, Map.empty[String, String]))
      .select(kept.map(col).toSeq :+ col("__j.*"): _*)
  }
}
