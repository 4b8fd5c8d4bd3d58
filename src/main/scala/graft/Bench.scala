package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query at SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line (driver contract). A warmup pass at sf0.001 runs
  * first so JIT/codegen/parquet-reader warmup isn't billed to whichever
  * query happens to run first; the timed pass then measures steady-state
  * per-query wall time.
  */
object Bench {
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

    val warmupDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmupDir).isDirectory && warmupDir != sfDir) {
      SparkEntry.queries.foreach { case (_, fn) =>
        try fn(spark, warmupDir).count() catch { case _: Throwable => () }
      }
      spark.sharedState.cacheManager.clearCache()
    }

    // Best-of-2: each query runs twice and reports the faster pass, so a
    // one-off hiccup (first-touch file listing, GC pause, driver CPU
    // contention) doesn't masquerade as a query's steady-state cost.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val passes = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val timing =
          try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            -1.0 // sentinel: a thrown query must not masquerade as a timing
          }
        // drop per-query cached frames so one query's persist() doesn't
        // shrink storage memory for the rest of the run
        spark.sharedState.cacheManager.clearCache()
        timing
      }
      name -> (if (passes.exists(_ < 0)) -1.0 else passes.min)
    }
    // The driver keeps only the tail of this process's output, so the one
    // JSON line must stay short even with 100+ queries: keys are the qNN
    // prefix (unique across the inventory) and values are centisecond
    // precision. Full names + nanosecond precision go to bench_full.json.
    def fmt(v: Double): String = if (v < 0) "-1" else f"$v%.2f"
    val qs = results.map { case (k, v) => "\"" + k.takeWhile(_ != '_') + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val full = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get("bench_full.json"),
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$full,"sf":"$sfDir"}""")
    catch { case _: Throwable => () }
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
