package graft

import org.apache.spark.sql.functions._

import graft.core.{Sessions, Tables}
import graft.pipeline.{Dedup, TextOps}

/** Dev smoke driver: exercises the hash/dedup/text operators end-to-end
  * on the sf0.001 testdata through a real local SparkSession.
  * Run: `sbt "runMain graft.Smoke"`.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("graft-smoke", cores = 4)
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val t = Tables(spark, sf)
    val docs = t.documents

    val fp = docs.select(col("doc_id"),
      TextOps.fingerprint(col("text")).as("fp"))
    println(s"fingerprint rows=${fp.count()}")
    fp.show(3, truncate = false)

    val exact = Dedup.exact(docs)
    println(s"exact-dup groups>1: ${exact.where(col("group_size") > 1).count()}")

    val near = Dedup.minhashNearDups(docs)
    println(s"minhash near-dup pairs: ${near.count()}")
    near.show(5, truncate = false)

    val quality = TextOps.qualityScore(docs)
    quality.select("doc_id", "n_tokens", "quality_score").show(3)

    val lang = TextOps.languageId(docs)
    lang.groupBy("lang_pred").count().show()

    val sims = Dedup.simhashNearDups(docs)
    println(s"simhash near-dup pairs: ${sims.count()}")

    val emb = t.embeddings
    val knn = graft.pipeline.Similarity.bruteForceTopK(emb.limit(3), emb, k = 2)
    knn.show(6, truncate = false)

    spark.stop()
  }
}
