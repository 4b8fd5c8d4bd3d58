package graft

import org.apache.spark.sql.SparkSession

/** Library entry point for users: a SparkSession.Builder with graft's
  * extensions and the configuration the library is tested under.
  *
  *   val spark = GraftSession.builder().master("local[*]").getOrCreate()
  *
  * installs the native SQL functions (simhash, min_rolling_hash,
  * long_dot, srp_bits), the RangeJoinRewrite optimizer rule, and the
  * TopKPerKey planner strategy ([[graft.functions.GraftExtensions]]) —
  * the same wiring a cluster gets from
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions`.
  * UTC session time keeps timestamp semantics identical to the oracle-
  * checked test matrix; AQE stays on for runtime coalescing/skew
  * handling. Shuffle partitioning is deliberately NOT pinned here —
  * size it to the deployment (cores locally, data volume on a cluster).
  */
object GraftSession {
  def builder(): SparkSession.Builder = SparkSession.builder()
    .withExtensions(new graft.functions.GraftExtensions)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
}
