package graft.core

import org.apache.spark.sql.DataFrame

/** Lineage truncation for iterative DataFrame algorithms (connected
  * components, PageRank, Lloyd's k-means). Each round of such a loop doubles
  * the logical plan unless the round's result is checkpointed; the question
  * is WHICH checkpoint.
  *
  *  - `localCheckpoint()` stores the blocks unreplicated on the executors
  *    that computed them. Fast (no filesystem round-trip) but not durable:
  *    on a real cluster, losing one executor mid-iteration loses blocks that
  *    can no longer be recomputed (the lineage was truncated) and kills the
  *    job. Fine on `local[n]`, where executor loss means JVM loss anyway.
  *  - `checkpoint()` writes the blocks to the SparkContext's checkpoint
  *    directory (HDFS/object store on a cluster) — survives any executor
  *    loss, which is the only safe mode on a preemptible fleet.
  *
  * [[truncate]] selects automatically: if the session has a checkpoint
  * directory configured (`SparkContext.setCheckpointDir`, as any production
  * cluster job should), every iterative operator in this library uses
  * reliable `checkpoint()`; otherwise it falls back to `localCheckpoint()`.
  * One knob, zero API change at the operator call sites.
  */
object Lineage {

  /** True iff reliable checkpointing is available on this session. */
  def reliable(df: DataFrame): Boolean =
    df.sparkSession.sparkContext.getCheckpointDir.isDefined

  /** Eagerly materialize `df` and truncate its lineage — reliably when a
    * checkpoint dir is set, executor-locally otherwise.
    */
  def truncate(df: DataFrame, eager: Boolean = true): DataFrame =
    if (reliable(df)) df.checkpoint(eager) else df.localCheckpoint(eager)
}
