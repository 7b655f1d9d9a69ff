ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "nowdbspark"
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
run / connectInput := true // graft.Shell reads statements from stdin
// Pass the forked run's stdout straight through (no "[info] " log
// prefix) so Bench's one-line JSON is machine-parseable from the
// captured output tail.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // Heap sized to the executor threads it hosts (guide §5), still
  // env-overridable. local[32] packs 32 concurrently-allocating tasks
  // into ONE JVM — a production cluster gives each executor 4-8 GB, so
  // an 8 GB ceiling here is ~250 MB per running task, far below any
  // real deployment. Measured on the full 422-query bench at 32 cores
  // (r16, jstat -gcutil sampled through both runs): at 8 GB the suite
  // spent 313 s in GC within the first 9 minutes (1000 full GCs, old
  // gen at 99%) and late-suite queries degraded 2-4x vs their isolated
  // walls; at 24 GB the same phase ran 0.8 s of GC, suite total
  // 318.2 -> 281.2 s (-12%), with the late TPC-DS family recovering
  // 2-4x (q414 4.00 -> 0.94 s). The 8-core-faster-than-32 inversion in
  // the r15 records traces to exactly this: 4x the allocation rate on
  // the same 8 GB heap.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // Bound the young gen: with a 24 GB max heap G1's adaptive young
  // sizing (200 ms pause goal) lets young grow to ~14 GB, and 1-2 s
  // allocation-heavy queries eat one long young pause inside their
  // timed window — measured isolated reps=5 medians, monotone with
  // heap size: q98 0.89 s @8g / 0.98 @12g / 1.07 @16g / 1.42 @24g,
  // q300 1.16/1.36/1.43/1.54. Pinning young at 4 GB (128 MB per
  // local[32] task) recovers the 8 GB walls while keeping 20 GB of
  // old-gen headroom for the suite's allocation history: q98 0.94,
  // q300 1.21 isolated; full suite 284.6 -> 279.0 s, q98 0.90 /
  // q300 0.97 / q297 0.49 in-suite. Env-appended opts below can
  // override (later -Xmn wins).
  "-Xmn4g",
) ++ sys.env.get("SPARK_DRIVER_JVM_OPTS")
  .toSeq.flatMap(_.trim.split("\\s+").toSeq.filter(_.nonEmpty))
