package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.VectorOps
import graft.tables.Tables

/** Diagnostic main: per-query recall@10 of each ANN index (SRP-LSH, IVF,
  * PQ) against the exact brute-force baseline, at a given SF dir. This is
  * the measurement behind the recall bounds q42/q44/q129 assert
  * (VectorQueries.recallBound): whenever an index implementation or its
  * training inputs change, run this at sf0.01 (the correctness gate's SF)
  * and at the bench SF, and keep the asserted bound below the printed
  * minimum with explicit headroom.
  *
  *   sbt "runMain graft.AnnRecallProbe /root/testdata/sf0.01"
  */
object AnnRecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, dir)
    val q = emb.filter(col("vec_id") < 5)
    val exact = VectorOps.bruteForceTopK(q, emb, k = 10)
    Seq(
      "srp-lsh" -> VectorOps.lshTopK(q, emb, k = 10),
      "ivf" -> VectorOps.ivfTopK(spark, q, emb, k = 10),
      "pq" -> VectorOps.pqTopK(spark, q, emb, k = 10),
      "ivfpq" -> VectorOps.ivfPqTopK(spark, q, emb, k = 10)
    ).foreach { case (name, approx) =>
      val rec = VectorOps.recallAgainst(approx, exact)
        .orderBy(col("query_id")).collect()
        .map(r => r.getLong(0) -> r.getDouble(1))
      val detail = rec.map { case (id, r) => f"q$id=$r%.2f" }.mkString(" ")
      println(f"[ann-recall] $name%-8s dir=$dir min=${rec.map(_._2).min}%.3f  $detail")
    }
    spark.stop()
  }
}
