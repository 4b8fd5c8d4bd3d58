package graft.sync

import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** Partition-level snapshot store — the 100 TB form of [[TableStore]].
  *
  * [[TableStore]] rewrites the whole table per merge, which is correct and
  * simple but O(table) per batch: a 100 TB target with a 10 MB CDC batch
  * would rewrite 100 TB. This store hash-buckets rows by entity key:
  *
  *   root/<table>/b<bucket>/v<N>/   — per-bucket parquet snapshots
  *   root/<table>/_MANIFEST.<N>     — "bucket version" lines: the snapshot
  *   root/<table>/_CURRENT          — live manifest number (atomic move)
  *
  * A merge only touches the buckets containing staged keys — cost
  * O(batch ∕ table-fraction), not O(table). Readers resolve `_CURRENT` →
  * manifest → per-bucket version dirs, so an in-flight merge is invisible
  * until its single pointer move, exactly the [[TableStore]] protocol one
  * directory deeper. Crash mid-merge leaves orphan v-dirs, never a torn
  * snapshot.
  *
  * Bucket count is fixed at table creation (like any hash-bucketed
  * layout); pick it so bucket size ≈ a few parquet row groups at target
  * scale. The bucket id is a data column (`_bucket`) so reads recover it
  * without path parsing and the merge's bucket routing is one codegen'd
  * `pmod(xxhash64(key))`.
  */
final class BucketedTableStore(spark: SparkSession, root: String, nBuckets: Int)
    extends SyncStore {

  require(nBuckets > 0)

  def bucketCol(key: String): Column = pmod(xxhash64(col(key)), lit(nBuckets))

  private def tableDir(name: String): Path = Paths.get(root, name)
  private def currentFile(name: String): Path = tableDir(name).resolve("_CURRENT")
  private def manifestFile(name: String, v: Int): Path =
    tableDir(name).resolve(s"_MANIFEST.$v")

  private def currentManifestVersion(name: String): Option[Int] = {
    val f = currentFile(name)
    if (Files.exists(f)) Some(new String(Files.readAllBytes(f)).trim.toInt) else None
  }

  private def parseManifest(name: String, v: Int): Map[Int, Int] =
    Files.readAllLines(manifestFile(name, v)).asScala.filter(_.nonEmpty).map { line =>
      val Array(b, bv) = line.trim.split(' ')
      b.toInt -> bv.toInt
    }.toMap

  /** bucket → live version for that bucket. */
  def manifest(name: String): Option[Map[Int, Int]] =
    currentManifestVersion(name).map(parseManifest(name, _))

  private def bucketPath(name: String, bucket: Int, v: Int): Path =
    tableDir(name).resolve(s"b$bucket").resolve(s"v$v")

  def read(name: String): Option[DataFrame] = readBuckets(name, None)

  /** Time travel: read the snapshot a historical manifest described.
    * Manifests are immutable once written, so any retained manifest
    * number reconstructs that exact table state. */
  def readAtManifest(name: String, manifestVersion: Int): Option[DataFrame] = {
    val f = manifestFile(name, manifestVersion)
    if (!Files.exists(f)) None
    else {
      val m = Files.readAllLines(f).asScala.filter(_.nonEmpty).map { line =>
        val Array(b, bv) = line.trim.split(' ')
        b.toInt -> bv.toInt
      }.toMap
      val paths = m.map { case (b, v) => bucketPath(name, b, v).toString }.toSeq
      if (paths.isEmpty) Some(spark.emptyDataFrame)
      else Some(spark.read.parquet(paths: _*))
    }
  }

  /** Read the live snapshot, optionally restricted to a bucket subset —
    * the merge's way of scanning only what it will rewrite. */
  def readBuckets(name: String, buckets: Option[Set[Int]]): Option[DataFrame] =
    manifest(name).map { m =>
      val wanted = buckets.fold(m)(bs => m.view.filterKeys(bs).toMap)
      val paths = wanted.map { case (b, v) => bucketPath(name, b, v).toString }.toSeq
      if (paths.isEmpty) spark.emptyDataFrame
      else spark.read.parquet(paths: _*)
    }

  private def writeManifest(name: String, m: Map[Int, Int]): Unit =
    commitManifest(name, m, currentManifestVersion(name))

  /** Publish manifest `m` as the next state, REQUIRING that the live
    * manifest is still `expectedBase` — optimistic concurrency for the
    * single-writer protocol. A merge builds its manifest as
    * base-snapshot ++ its-buckets; if another writer committed after
    * this writer read its base, blindly publishing would silently drop
    * the other writer's bucket updates (a lost update, not a crash).
    * The stale commit throws instead; the caller re-reads and re-merges.
    * The check-then-move window is epsilon vs the merge runtime — the
    * same compare-and-swap discipline transactional table formats use,
    * minus a distributed lock this environment doesn't need. */
  private[graft] def commitManifest(name: String, m: Map[Int, Int],
      expectedBase: Option[Int]): Unit = {
    val live = currentManifestVersion(name)
    if (live != expectedBase)
      throw new java.util.ConcurrentModificationException(
        s"$name: manifest moved $expectedBase -> $live since this writer " +
          "read its base; re-read and re-merge (lost-update protection)")
    val next = live.getOrElse(-1) + 1
    val body = m.toSeq.sorted.map { case (b, v) => s"$b $v" }.mkString("\n")
    Files.createDirectories(tableDir(name))
    Files.write(manifestFile(name, next), body.getBytes,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    val tmp = tableDir(name).resolve(s"_CURRENT.tmp$next")
    Files.write(tmp, next.toString.getBytes,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    Files.move(tmp, currentFile(name), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Initial full write: every row routed to its bucket, one snapshot dir
    * per bucket, manifest v0. One distributed write job — the bucket
    * routing is a partitionBy on the derived `_bucket` column. */
  def writeAll(name: String, df: DataFrame, key: String,
      sortBy: Option[String] = None): Unit = {
    val base = currentManifestVersion(name)
    val next = base.getOrElse(-1) + 1
    val staging = tableDir(name).resolve(s"_staging$next")
    // `_bucket` stays a DATA column (reads must recover it without path
    // parsing); `_bp` is its copy used only for the write-time routing —
    // partitionBy consumes the routing column, the data column survives.
    // repartition on the bucket: without it every write task emits a file
    // into every bucket dir (tasks × buckets tiny files); with it each
    // bucket is written by exactly one task as one file
    val withBucket = df.withColumn("_bucket", bucketCol(key))
      .repartition(col("_bucket"))
    val sorted = sortBy.fold(withBucket)(c =>
      withBucket.sortWithinPartitions(col("_bucket"), col(c)))
    sorted.withColumn("_bp", col("_bucket"))
      .write.mode("overwrite").partitionBy("_bp").parquet(staging.toString)
    val entries = (0 until nBuckets).flatMap { b =>
      val src = staging.resolve(s"_bp=$b")
      if (Files.exists(src)) {
        val dest = bucketPath(name, b, next)
        Files.createDirectories(dest.getParent)
        Files.move(src, dest, StandardCopyOption.ATOMIC_MOVE)
        Some(b -> next)
      } else None
    }
    cleanupDir(staging)
    commitManifest(name, entries.toMap, base)
  }

  /** Partition-level merge: delete-then-insert upsert against ONLY the
    * buckets containing staged keys. `stage` must carry the target schema
    * plus `eventName` (REMOVEs are applied as deletes, like
    * [[Merge.applyStage]]). Untouched buckets keep their live version —
    * their bytes are never read, shuffled, or rewritten. */
  def merge(name: String, stage: DataFrame, key: String,
      syncTime: java.sql.Timestamp, sortBy: Option[String] = None): Unit =
    // base is captured once: the commit at the end is conditional on the
    // live manifest still being this one (lost-update protection)
    mergeAtBase(name, stage, key, syncTime, currentManifestVersion(name), sortBy)

  /** [[merge]] with the base manifest made explicit — the seam the
    * stale-writer tests drive: a base captured before a concurrent winner
    * committed must refuse and leave the winner's buckets untouched. */
  private[graft] def mergeAtBase(name: String, stage: DataFrame, key: String,
      syncTime: java.sql.Timestamp, base: Option[Int],
      sortBy: Option[String] = None): Unit = {
    val m = base.map(parseManifest(name, _)).getOrElse(
      throw new IllegalStateException(s"$name not initialized — writeAll first"))
    val staged = stage.withColumn("_bucket", bucketCol(key))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val touched = staged.select(col("_bucket")).distinct()
        .collect().map(_.getLong(0).toInt).toSet
      if (touched.nonEmpty) {
        // a touched bucket may have NO manifest entry yet (writeAll only
        // records buckets that received rows): read the existing subset,
        // or an empty-but-schemaed frame when every touched bucket is new
        val existing = touched.intersect(m.keySet)
        val target =
          if (existing.nonEmpty) readBuckets(name, Some(existing)).get
          else if (m.nonEmpty) readBuckets(name, Some(Set(m.keys.head))).get.limit(0)
          else throw new IllegalStateException(
            s"$name has an empty manifest — writeAll must seed at least one bucket")
        val stageKeys = staged.select(col(key))
        val kept = target.join(stageKeys, Seq(key), "left_anti")
        val inserts = staged.filter(col("eventName") =!= "REMOVE")
          .drop("eventName")
          .withColumn("syncTimestamp", lit(syncTime))
          .select(target.columns.map(col).toIndexedSeq: _*)
        val next = base.get + 1
        val staging = tableDir(name).resolve(s"_staging$next")
        val merged = kept.unionByName(inserts)
          .repartition(col("_bucket")) // one file per bucket, see writeAll
        sortBy.fold(merged)(c =>
            merged.sortWithinPartitions(col("_bucket"), col(c)))
          .withColumn("_bp", col("_bucket"))
          .write.mode("overwrite").partitionBy("_bp").parquet(staging.toString)
        // a touched bucket may end up empty (all rows removed) — it still
        // advances, pointing at an empty-but-valid parquet dir. Materialize
        // the empties INTO STAGING too: nothing below may write directly to
        // a v-dir, which could be a concurrent winner's published data.
        touched.foreach { b =>
          val src = staging.resolve(s"_bp=$b")
          if (!Files.exists(src))
            spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
              target.schema).write.mode("overwrite").parquet(src.toString)
        }
        // Re-check the base before any move: a stale writer must abandon
        // its staging dir, not clobber the winner's bucket versions. An
        // already-existing dest is the same staleness signal (a racing
        // writer published v<next> between the check and this move).
        def stale(): Nothing = {
          cleanupDir(staging)
          throw new java.util.ConcurrentModificationException(
            s"$name: manifest moved past $base while merging; " +
              "re-read and re-merge (lost-update protection)")
        }
        if (currentManifestVersion(name) != base) stale()
        val updated = touched.map { b =>
          val dest = bucketPath(name, b, next)
          Files.createDirectories(dest.getParent)
          try Files.move(staging.resolve(s"_bp=$b"), dest,
            StandardCopyOption.ATOMIC_MOVE)
          catch { case _: java.nio.file.FileAlreadyExistsException => stale() }
          b -> next
        }.toMap
        cleanupDir(staging)
        commitManifest(name, m ++ updated, base)
      }
    } finally staged.unpersist()
  }

  /** Point lookup: read only the buckets that can contain `values` of the
    * entity key — the hash-bucketed layout's payoff for selective reads.
    * A k-key probe against an N-bucket table opens ≤ k bucket dirs, not
    * the table; at 100 TB with 128 MB buckets that is MBs of IO per probe.
    * The residual filter keeps correctness for hash collisions. */
  def lookup(name: String, key: String, values: Seq[String]): Option[DataFrame] = {
    import spark.implicits._
    val buckets = values.toDF(key).select(bucketCol(key))
      .collect().map(_.getLong(0).toInt).toSet
    readBuckets(name, Some(buckets)).map(_.filter(col(key).isin(values: _*)))
  }

  /** Bucket-count evolution: rewrite the live snapshot into `newN` buckets
    * (the fixed-at-creation count's escape hatch once buckets outgrow a
    * few row groups). One distributed read+route+write of the LIVE data
    * only — history stays under the old bucket count and remains
    * time-travelable until vacuumed. Returns the new store handle. */
  def rebucket(name: String, key: String, newN: Int,
      newRoot: String, sortBy: Option[String] = None): BucketedTableStore = {
    val live = read(name).getOrElse(
      throw new IllegalStateException(s"$name not initialized — writeAll first"))
    val next = new BucketedTableStore(spark, newRoot, newN)
    next.writeAll(name, live.drop("_bucket"), key, sortBy)
    next
  }

  /** Retention sweep: keep the `keepManifests` most recent manifests
    * (always including the live one) and every bucket version any of them
    * references; delete older manifests, unreferenced bucket v-dirs, and
    * orphaned staging dirs from crashed merges. Without this, every merge
    * leaks its superseded bucket versions forever — at 100 TB the leak,
    * not the live data, dominates storage. Deletion order is crash-safe:
    * manifests below the retention floor go first, so an interrupted
    * sweep leaves unreferenced dirs (re-collectable) but never a manifest
    * pointing at deleted data. Returns (manifests deleted, dirs deleted). */
  def vacuum(name: String, keepManifests: Int): (Int, Int) = {
    require(keepManifests >= 1, "must keep at least the live manifest")
    currentManifestVersion(name) match {
      case None => (0, 0)
      case Some(cur) =>
        val floor = cur - keepManifests + 1
        val dropped = (0 until floor).filter(v => Files.exists(manifestFile(name, v)))
        dropped.foreach(v => Files.delete(manifestFile(name, v)))
        // union of (bucket, version) pairs the retained manifests still need
        val live: Set[(Int, Int)] = (math.max(0, floor) to cur).flatMap { v =>
          val f = manifestFile(name, v)
          if (!Files.exists(f)) Nil
          else Files.readAllLines(f).asScala.filter(_.nonEmpty).map { line =>
            val Array(b, bv) = line.trim.split(' ')
            (b.toInt, bv.toInt)
          }
        }.toSet
        var dirs = 0
        (0 until nBuckets).foreach { b =>
          val bDir = tableDir(name).resolve(s"b$b")
          if (Files.exists(bDir)) {
            scala.util.Using.resource(Files.list(bDir))(_.iterator().asScala.toSeq)
              .filter(p => p.getFileName.toString.startsWith("v"))
              .foreach { p =>
                val v = p.getFileName.toString.drop(1).toInt
                if (!live.contains((b, v))) { cleanupDir(p); dirs += 1 }
              }
          }
        }
        scala.util.Using.resource(Files.list(tableDir(name)))(_.iterator().asScala.toSeq)
          .filter(_.getFileName.toString.startsWith("_staging"))
          // the live manifest's staging dir may still be mid-move only if a
          // merge is running; single-writer protocol says none is
          .foreach { p => cleanupDir(p); dirs += 1 }
        (dropped.size, dirs)
    }
  }

  /** [[SyncStore]] verbs — [[writeAll]] / [[merge]] under the shared names,
    * so [[graft.pipeline.Pipeline]] swaps this store in via config. */
  def init(name: String, df: DataFrame, key: String,
      sortBy: Option[String] = None): Unit = writeAll(name, df, key, sortBy)

  def applyMerge(name: String, stage: DataFrame, key: String,
      syncTime: java.sql.Timestamp, sortBy: Option[String] = None): Unit =
    merge(name, stage, key, syncTime, sortBy)

  /** [[SyncStore]] retention verb → [[vacuum]]. */
  def retain(name: String, keep: Int): Unit = vacuum(name, keep)

  private def cleanupDir(dir: Path): Unit =
    if (Files.exists(dir))
      scala.util.Using.resource(Files.walk(dir))(_.iterator().asScala.toSeq)
        .reverse.foreach(Files.deleteIfExists(_))
}
