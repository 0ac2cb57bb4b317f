ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "elasticsearchhadoopspark"
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
// Forked run output passes straight through to sbt's stdout with NO
// "[info] " log prefix — the driver's bench parser reads the summary
// JSON line from a bounded stdout tail, and the r9 artifact shows the
// prefixed line defeated it (BENCH_r09 "parsed": null).
run / outputStrategy := Some(StdoutOutput)
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
  // 16g default: at 10x-bench scale the LSH shingle cache no longer
  // fits 8g storage memory and eviction thrash made dedup runtimes
  // vary 3x (28s vs 71s at the scale probe); the box has 128 GiB
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // JDK 17 reserves 240m of code cache; the 136-query bench suite
  // generates enough whole-stage-codegen classes to fill it, after
  // which HotSpot stops JIT-compiling and late-alphabet queries run
  // interpreted (r3: q_tpch_q1 10.8s in-suite vs 2.0s isolated —
  // same plan, same data). 1g keeps every query compiled.
  "-XX:ReservedCodeCacheSize=1g",
)
