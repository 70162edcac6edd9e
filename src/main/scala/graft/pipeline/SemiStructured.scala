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
    * `"k INT, tag STRING"`), dropping the raw string.
    */
  def extractJson(df: DataFrame, jsonCol: String, ddl: String): DataFrame =
    df.withColumn("__j", from_json(col(jsonCol), ddl, Map.empty[String, String]))
      .select(df.columns.filter(_ != jsonCol).map(col).toSeq :+ col("__j.*"): _*)
}
