package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.Dedup

object TmpDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", false)
      .appName("tmpdebug").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val docs = spark.read.parquet(s"/root/testdata/$sf/documents.parquet")
      val sigs = docs.select(col("doc_id"),
        graft.functions.Signatures.simhashSigWide(col("text"), 3, 8).as("sig"))
        .where(col("sig").isNotNull).collect()
        .map(r => (r.getLong(0), r.getAs[scala.collection.Seq[Long]]("sig").toArray))
      // old 30-bit pairs at radius 6
      val old = Dedup.simhashNearDups(docs).select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val bySig = sigs.toMap
      val oldWide = old.toSeq.map { case (a, b) =>
        bySig(a).zip(bySig(b)).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum
      }.sorted
      println(s"$sf: old-pair wide dists: min=${oldWide.min} p50=${oldWide(oldWide.size / 2)} max=${oldWide.max} n=${oldWide.size}")
      val all = (for {
        (ia, fa) <- sigs; (ib, fb) <- sigs if ia < ib
      } yield fa.zip(fb).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum).sorted
      println(s"$sf: all-pair wide dists: min=${all.take(30).mkString(",")}")
      val counts = Seq(10, 15, 20, 23, 30, 40, 48).map(r => s"r$r=${all.count(_ <= r)}")
      println(s"$sf: pair counts by radius: ${counts.mkString(" ")}")
    }
    spark.stop()
  }
}
