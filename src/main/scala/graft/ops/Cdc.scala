package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture application: fold an (op, id, payload, seq)
  * changelog into a base snapshot — the lakehouse MERGE INTO / CDC-apply
  * step that turns [[graft.pipeline.Profile.snapshotDiff]]'s output class
  * back into state. Two faces:
  *
  *  - [[latestState]]: the next snapshot (upserts applied, deletes
  *    dropped) — last-writer-wins on the sequence number.
  *  - [[scd2]]: the slowly-changing-dimension type-2 history — every
  *    version kept with its [valid_from, valid_to) interval, deletes
  *    closing the predecessor's interval without emitting a row.
  *
  * Scale shape: both are ONE shuffle on the id key. latestState is a
  * per-id window top-1 (partial-combined by the window's own hash
  * partitioning) plus a full-outer join against the base; scd2 is a
  * single lead() window. No collects, no iteration — a 100 TB changelog
  * folds in one pass.
  */
object Cdc {

  /** Tie-break on equal seq is (seq desc, op desc) — deterministic, and
    * 'U' > 'I' > 'D' lexicographically means an upsert beats a same-seq
    * delete (document the convention; real logs have unique seqs).
    */
  def latestState(base: DataFrame, log: DataFrame, idCol: String = "doc_id",
      payloadCol: String = "text", seqCol: String = "seq",
      opCol: String = "op"): DataFrame = {
    val w = Window.partitionBy(idCol).orderBy(col(seqCol).desc, col(opCol).desc)
    val latest = log
      .withColumn("__rn", row_number().over(w)).where(col("__rn") === 1)
      .select(col(idCol), col(opCol).as("__op"), col(payloadCol).as("__p"))
    base.select(col(idCol), col(payloadCol))
      .join(latest, Seq(idCol), "full_outer")
      .where(col("__op").isNull || col("__op") =!= "D")
      .select(col(idCol),
        when(col("__op").isNotNull, col("__p"))
          .otherwise(col(payloadCol)).as(payloadCol))
  }

  /** `openEnd` is the exclusive-upper sentinel for the current version
    * (Long.MaxValue by default) — kept non-null so the BIGINT column
    * survives a parquet→pandas round trip without decaying to float64.
    */
  def scd2(log: DataFrame, idCol: String = "doc_id",
      payloadCol: String = "text", seqCol: String = "seq",
      opCol: String = "op", openEnd: Long = Long.MaxValue): DataFrame = {
    val w = Window.partitionBy(idCol).orderBy(col(seqCol), col(opCol))
    log
      .withColumn("valid_to", coalesce(lead(col(seqCol), 1).over(w), lit(openEnd)))
      .where(col(opCol) =!= "D")
      .select(col(idCol), col(payloadCol), col(seqCol).as("valid_from"),
        col("valid_to"), (col("valid_to") === openEnd).as("is_current"))
  }
}
