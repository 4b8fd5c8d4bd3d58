package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Join utilities for the shapes that break at 100 TB: skewed keys and
  * repeated co-located joins.
  */
object JoinOps {

  /** Salted inner equi-join for skewed keys: the large (skewed) side gets
    * a random-ish salt in [0, saltFactor); the small side is exploded
    * `saltFactor`× so every (key, salt) pair matches. One hot key spreads
    * over `saltFactor` reducers instead of melting one.
    *
    * The salt is derived deterministically (hash of the whole large-side
    * row) so results are reproducible; semantically the join output is
    * identical to the unsalted join — JoinOpsSpec proves it. AQE's skew
    * handling covers sort-merge joins automatically; explicit salting
    * remains necessary for skewed aggregations and for deterministic
    * partition sizing.
    */
  def saltedEquiJoin(large: DataFrame, small: DataFrame, key: String,
      saltFactor: Int): DataFrame = {
    val saltedLarge = large.withColumn("_salt",
      pmod(xxhash64(struct(large.columns.map(col).toIndexedSeq: _*)), lit(saltFactor)))
    val saltedSmall = small
      .withColumn("_salt", explode(sequence(lit(0L), lit(saltFactor - 1L))))
    saltedLarge.join(saltedSmall, Seq(key, "_salt")).drop("_salt")
  }

  /** Register two frames as bucketed+sorted tables on the join key and
    * return them re-read: subsequent equi-joins on `key` are co-located —
    * no shuffle on either side (the plan shows no Exchange above the
    * scans). This is the DISTKEY story for repeatedly-joined big tables:
    * pay the partitioning once at write time.
    */
  def bucketize(spark: SparkSession, dfs: Map[String, DataFrame], key: String,
      buckets: Int): Map[String, DataFrame] = {
    dfs.map { case (name, df) =>
      spark.sql(s"DROP TABLE IF EXISTS $name")
      // DROP clears the catalog entry but a previous session may have left
      // the managed location behind, which saveAsTable refuses to reuse
      val warehouse = java.net.URI.create(
        spark.conf.get("spark.sql.warehouse.dir")).getPath
      val loc = java.nio.file.Paths.get(warehouse, name)
      if (java.nio.file.Files.exists(loc)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
      df.write.mode("overwrite")
        .bucketBy(buckets, key).sortBy(key)
        .format("parquet")
        .saveAsTable(name)
      name -> spark.table(name)
    }
  }
}
