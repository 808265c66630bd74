package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Ann, Q}

/** Parameter-tuning probe for the q98 ANN recall contract (not part of
  * the bench contract): measures annTopK / ivfTopK recall against the
  * brute-force top-k on each test SF so the registered contract floor
  * is an informed margin, not a guess.
  *
  *   sbt 'runMain graft.AnnTune'
  */
object AnnTune {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val emb = Q.table(spark, dir, "embeddings").select("vec_id", "embedding")
      val queries = emb.filter(col("vec_id") % 10 === 0)
      val k = 10
      val brute = Ann.bruteTopK(emb, queries, k).select("q_id", "vec_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(s"== $sf corpus=${emb.count()} queries=${queries.count()} exact=${brute.size}")
      for (nPlanes <- Seq(8, 10, 12); probes <- Seq(0, 1)) {
        val t0 = System.nanoTime()
        val ann = Ann.annTopK(emb, queries, k, nPlanes = nPlanes, probes = probes)
          .select("q_id", "vec_id")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val sec = (System.nanoTime() - t0) / 1e9
        val recall = (ann & brute).size.toDouble / brute.size
        println(f"  lsh planes=$nPlanes probes=$probes recall=$recall%.4f ($sec%.1fs)")
      }
      for (nlist <- Seq(16); nprobe <- Seq(4, 8)) {
        val t0 = System.nanoTime()
        val ivf = Ann.ivfTopK(emb, queries, k, nlist = nlist, nprobe = nprobe)
          .select("q_id", "vec_id")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val sec = (System.nanoTime() - t0) / 1e9
        val recall = (ivf & brute).size.toDouble / brute.size
        println(f"  ivf nlist=$nlist nprobe=$nprobe recall=$recall%.4f ($sec%.1fs)")
      }
    }
    spark.stop()
  }
}
