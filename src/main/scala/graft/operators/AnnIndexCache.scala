package graft.operators

import scala.collection.concurrent.TrieMap

/** Driver-side memo for trained ANN index state (IVF coarse quantizer,
  * PQ codebooks). A 100 TB deployment trains an index ONCE and amortizes
  * it over every query; timing train+probe per query call — what the
  * bench did through round 7 — mis-prices the operators (q44/q129 were
  * the noisiest pins in the ledger for exactly this reason, flagged in
  * round 7's verdict). Keyed by (dataset dir, index params); entries are
  * small driver objects (centroid arrays), never corpus-sized.
  *
  * Build wall-time is recorded per key on miss so the bench can report
  * index-build cost separately from probe cost ([[buildSeconds]] →
  * bench_full.json's "ann_build" section).
  *
  * The key carries a cheap dataset VERSION marker ([[datasetVersion]]:
  * max mtime + file count + total bytes from a driver-side metadata walk,
  * the same trick the q95 scratch layout uses) rather than a content
  * fingerprint — hashing 100 TB to detect a swap underneath a live
  * session is not this layer's job, but an in-place REWRITE of a dataset
  * dir changes mtimes/sizes and must not serve the stale index, so
  * staleness now fails closed without the caller remembering
  * [[invalidate]] (which remains available for exotic transports where
  * the key isn't a filesystem path).
  */
object AnnIndexCache {
  private val cache = TrieMap.empty[String, Any]
  private val buildSec = TrieMap.empty[String, Double]

  /** Cheap version marker for a dataset directory: hex(max lastModified),
    * file count, and total bytes from a recursive metadata-only walk. A
    * rewrite in place (new part files, new mtimes, usually new sizes)
    * yields a new marker; a non-existent or non-path key yields "na" so
    * non-filesystem index keys degrade to plain memoization. Driver-side
    * listing only — never reads data, so cost is metadata ops, not bytes.
    */
  def datasetVersion(path: String): String = {
    val root = new java.io.File(path)
    if (!root.exists) "na"
    else {
      var maxM = 0L; var n = 0L; var bytes = 0L
      def walk(f: java.io.File): Unit = {
        val m = f.lastModified(); if (m > maxM) maxM = m
        n += 1
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(walk))
        else bytes += f.length()
      }
      walk(root)
      s"${maxM.toHexString}-$n-${bytes.toHexString}"
    }
  }

  /** Session marker for memo keys holding SparkContext-bound state
    * (localCheckpoint RDDs): applicationId + context start time. Those
    * two identify the CONTEXT the blocks live in, which is exactly the
    * lifetime that matters — a checkpointed RDD must never be served
    * into a different context. The former
    * `System.identityHashCode(spark)` marker was not unique: a session
    * created after the old one is stopped and GC'd can collide, making
    * the memo serve an RDD bound to a dead context (a runtime failure
    * instead of a rebuild). */
  def sessionMarker(spark: org.apache.spark.sql.SparkSession): String =
    s"${spark.sparkContext.applicationId}@${spark.sparkContext.startTime.toHexString}"

  /** Memoized build: on miss, runs `build`, records its wall-time, caches
    * the result. Thread-safe; concurrent first calls may both build (last
    * write wins — builds are deterministic, so the results are equal). */
  def memo[T](key: String)(build: => T): T =
    cache.get(key) match {
      case Some(v) => v.asInstanceOf[T]
      case None =>
        val t0 = System.nanoTime()
        val v = build
        buildSec.put(key, (System.nanoTime() - t0) / 1e9)
        cache.put(key, v)
        v
    }

  /** [[memo]] with dataset-scoped eviction: `prefix` names the index
    * family for one dataset (e.g. `"ivf:<dir>:"`), `rest` the
    * version+params tail. On a miss, OTHER entries under the prefix are
    * evicted first: an in-place rewrite (new `v=` marker) must not leak
    * every superseded model — centroid/codebook arrays pinned for the
    * JVM lifetime — nor leave stale build-seconds rows that would emit
    * duplicate ann_build keys in the bench ledger. The trade-off is that
    * two PARAMETER variants of one dataset's index no longer coexist
    * (alternating configs rebuild each time); the probe paths use one
    * config per dataset, so eviction wins. */
  def memoKeyed[T](prefix: String, rest: String)(build: => T): T = {
    val key = prefix + rest
    if (!cache.contains(key)) {
      cache.keys.filter(k => k.startsWith(prefix) && k != key)
        .foreach(cache.remove)
      buildSec.keys.filter(k => k.startsWith(prefix) && k != key)
        .foreach(buildSec.remove)
    }
    memo(key)(build)
  }

  /** Dataset-wide stale-version sweep (r17 advice): [[memoKeyed]]'s
    * per-prefix eviction can't see STALE SIBLING FAMILIES — the nlist /
    * keyTag variant segments live in the prefix (so variants coexist,
    * the r14 mutual-eviction fix), which means a dataset rewrite that
    * changes sizedNlist(n) strands the old-nlist family: its centroids
    * and corpus-sized checkpointed postings stay pinned for the JVM
    * lifetime and its stale buildSeconds rows emit duplicate ann_build
    * keys. Call this with the dataset-level prefix (e.g. `"ivf:$dir:"`)
    * and the CURRENT version marker before memoizing: every entry under
    * the prefix not carrying `v=$ver` (as a `:`-delimited segment) is
    * evicted, across all variant families at once. */
  def evictStaleVersions(datasetPrefix: String, ver: String): Unit = {
    val mid = s":v=$ver:"
    val end = s":v=$ver"
    def stale(k: String): Boolean =
      k.startsWith(datasetPrefix) && !k.contains(mid) && !k.endsWith(end)
    cache.keys.filter(stale).foreach(cache.remove)
    buildSec.keys.filter(stale).foreach(buildSec.remove)
  }

  /** Build wall-times recorded so far, keyed as passed to [[memo]]. */
  def buildSeconds: Map[String, Double] = buildSec.toMap

  def invalidate(prefix: String): Unit = {
    cache.keys.filter(_.startsWith(prefix)).foreach(cache.remove)
    buildSec.keys.filter(_.startsWith(prefix)).foreach(buildSec.remove)
  }

  def clear(): Unit = { cache.clear(); buildSec.clear() }
}
