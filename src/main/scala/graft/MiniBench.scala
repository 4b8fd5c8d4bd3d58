package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc subset benchmark: times the named queries (args) best-of-2 at
  * SPARK_GRAFT_SF_DIR — the local iteration loop behind Bench. */
object MiniBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val t = (System.nanoTime() - t0) / 1e9
        spark.sharedState.cacheManager.clearCache()
        t
      }
      println(f"[minibench] $name%-30s ${times.min}%.2f s (passes: ${times.map(t => f"$t%.2f").mkString(", ")})")
    }
    spark.stop()
  }
}
