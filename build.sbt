ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "skoltexterbyaispark"
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
// Forked `run` output defaults to sbt's logger, which prefixes every line
// with `[info] ` (and drops it entirely under `sbt --error`). The driver
// parses graft.Bench's final JSON line from raw stdout, so route forked
// process output straight through unprefixed.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// The box's default locale is ANSI_X3.4-1968, which makes java.nio.Path
// reject non-ASCII filenames (sun.jnu.encoding is locale-derived and NOT
// overridable via -D). KeyedFileSink writes Swedish keys; fork with a
// UTF-8 locale so the filesystem charset is sane.
Test / envVars ++= Map("LANG" -> "C.utf8", "LC_ALL" -> "C.utf8")
run / envVars ++= Map("LANG" -> "C.utf8", "LC_ALL" -> "C.utf8")
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
  // The box's locale is ANSI_X3.4-1968; without these, java.nio.Path
  // rejects non-ASCII filenames (KeyedFileSink writes Swedish keys).
  "-Dfile.encoding=UTF-8",
  "-Dsun.jnu.encoding=UTF-8",
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 24g: local[32] runs driver + all 32 executor threads in ONE heap; at
  // 8g a 100-query bench sweep accumulates enough broadcast/codegen/shuffle
  // state that the heavy tail queries GC-thrash (t53 measured 93 s in-context
  // vs 9.5 s isolated). The box has 128 GiB.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // A 100-query sweep (or a 20-stage stress run) generates far more JIT'd
  // code than the 240 MB default code cache holds; once it fills, flushing
  // evicts hot methods and late stages run interpreted (measured 20-30x on
  // the stress tail). 1g keeps every generated class compiled.
  s"-XX:ReservedCodeCacheSize=${sys.env.getOrElse("SPARK_CODE_CACHE", "1g")}",
  // Escape hatch for one-off JVM flags (profiling, GC logs) without
  // editing the build: space-separated options.
) ++ sys.env.get("SPARK_GRAFT_EXTRA_JVM_OPTS").toSeq.flatMap(_.split("\\s+").filter(_.nonEmpty))
