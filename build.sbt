ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "examplecdkdynamodbstreamtoredshiftspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Best-effort PG-grammar engine for the dialect spec: DuckDB's JDBC jar
// (its SQL grammar is PostgreSQL-compatible — the same engine the
// correctness oracle uses) is picked up from the local cache when
// present; no dependency RESOLUTION happens (zero-egress safe), and when
// the jar is absent the PG-execution cases skip and Derby coverage
// stands alone.
Test / unmanagedJars ++= {
  val cache = file(sys.props("user.home")) / ".cache" / "coursier"
  (cache ** "duckdb_jdbc-*.jar").get.take(1).map(Attributed.blank)
}
// The bench driver parses the LAST stdout line of `sbt runMain` as JSON.
// Two separate sbt behaviors used to break that parse:
//   1. the trailing "[success] Total time: ..." banner printed AFTER the
//      JSON line (BENCH_r07 parsed:null) — suppressed via showSuccess;
//   2. sbt's default LoggedOutput strategy prefixes every forked-stdout
//      line with "[info] ", so even with the banner gone the tail's last
//      line was `[info] {...}` and still failed the parse (BENCH_r08
//      parsed:null). StdoutOutput passes the forked process's stdout and
//      stderr through verbatim, so the JSON line lands prefix-free.
// Bench additionally writes the same compact line to bench_compact.json
// as a file artifact, so parseability no longer depends on stream
// interleaving at all.
outputStrategy := Some(StdoutOutput)
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
Global / excludeLintKeys += showSuccess
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
