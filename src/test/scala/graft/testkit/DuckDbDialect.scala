package graft.testkit

import java.sql.SQLException

import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcDialects}

/** Minimal Spark JDBC dialect for DuckDB — registered by the PG-grammar
  * execution cases in JdbcDialectSpec. Spark 4's `tableExists` probe
  * RETHROWS the probe's SQLException unless the dialect classifies it as
  * object-not-found, and DuckDB's driver sets no SQLState — so without
  * this, Spark's own existence probe (not any graft statement) fails the
  * stage upload. Classification by message is what several shipped
  * dialects do for engines without SQLStates. Everything else inherits
  * the default (PostgreSQL-shaped) dialect behavior, which is the point
  * of the exercise: the statements under test stay in the PG grammar. */
object DuckDbDialect extends JdbcDialect {
  override def canHandle(url: String): Boolean =
    url.toLowerCase(java.util.Locale.ROOT).startsWith("jdbc:duckdb")

  override def isObjectNotFoundException(e: SQLException): Boolean = {
    def msgs(t: Throwable): Iterator[String] =
      Iterator.iterate[Throwable](t)(_.getCause).takeWhile(_ != null).take(5)
        .flatMap(x => Option(x.getMessage))
    msgs(e).exists(m =>
      m.contains("does not exist") || m.contains("Catalog Error"))
  }

  @volatile private var registered = false
  /** Idempotent registration (specs may run in any order). */
  def ensureRegistered(): Unit = synchronized {
    if (!registered) { JdbcDialects.registerDialect(this); registered = true }
  }
}
