ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "cranespark"
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
// forked main output goes straight to stdout, NOT through sbt's logger:
// the "[info] " prefix the logger adds would break machine parsing of
// Bench's one-line JSON result
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // Whole-stage codegen emits a class per stage; across a many-query run
  // the default JIT code cache fills, the compiler shuts off, and hot
  // loops drop to the interpreter (observed as 20x slowdowns late in a
  // bench run). Give codegen room + let the cache recycle.
  "-XX:ReservedCodeCacheSize=1g",
  "-XX:+UseCodeCacheFlushing",
  // The round-9 staging A/B profile (bench_local/profile_staging_r9.jsonl)
  // pinned the 45-155 s swing on identical cold runs to C2 compilation:
  // compiler-thread time tracks the wall-time inflation ~1:1 while host
  // steal stays <3% and GC <10 s. The proposed -XX:CICompilerCount=12
  // mitigation was A/B'd in round 10 (profile_staging_r10.jsonl, 3
  // flag-on vs 3 flag-off interleaved sessions): NULL RESULT - means
  // 31.9 s vs 31.3 s, overlapping 27.6-36.1 s bands - because the
  // round-10 one-join staging rewrite had already shrunk the generated
  // kernels (and their JIT time, 124 s -> ~50 s) enough that the C2
  // storm is gone. Default therefore stays the JVM's own; set
  // SPARK_GRAFT_CI_COUNT=<n> to re-pin compiler threads for future
  // profiles.
) ++ (sys.env.getOrElse("SPARK_GRAFT_CI_COUNT", "0") match {
  case "0" => Seq.empty[String]
  case n   => Seq(s"-XX:CICompilerCount=$n")
})
