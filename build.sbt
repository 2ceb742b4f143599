ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "frauddetectionspark"
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
// Parallel forked test groups (r16, VERDICT #7): the 70-suite run was
// sequential in ONE forked JVM (~35 min at r14 — past the driver's
// test budget, hence `tests_ok: false` with no failing assertion).
// Suites split round-robin into 4 groups, each its own JVM with its
// own local[4] SparkSession — independent SparkContexts isolate
// cleanly across processes, and the per-JVM shared-session model
// inside each group is unchanged. Cross-JVM file collisions were
// audited: the bucketed warehouse and the format-roundtrip tmp paths
// are pid-suffixed; everything else uses createTempDirectory.
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val jopts = (Test / javaOptions).value.toVector
  val n = 4
  tests.sortBy(_.name).zipWithIndex.groupBy(_._2 % n).toSeq.sortBy(_._1)
    .map { case (i, g) =>
      Tests.Group(s"group$i", g.map(_._1),
        Tests.SubProcess(ForkOptions().withRunJVMOptions(jopts)))
    }
}
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, 4),
  Tags.limitAll(16))
// The driver parses the LAST stdout line of `sbt runMain graft.Bench` as
// JSON; sbt's trailing "[success] Total time: …" line broke that in
// rounds 1-2 ("parsed": null). Suppress it and pass forked output through
// unprefixed so the bench JSON line is genuinely last.
ThisBuild / showSuccess := false
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
  // not a Spark need: HostStat.safepointMs reflects HotSpot's
  // total-safepoint counter (per-trigger pause attribution in the
  // streaming bench); it degrades to -1 where this open is absent
  "java.management/sun.management",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // The JDK default 240 MB ReservedCodeCacheSize fills mid-sweep once
  // the query surface's whole-stage-codegen + JIT footprint crosses
  // ~150 MB (measured 152 MB at 242 queries): the sweeper then flushes
  // hot compiled methods and every JIT-heavy query pays a diffuse
  // 10-30% (round-13 A/B: the same 228 queries ran 93.5 s at 240 MB vs
  // 83.8 s at 512 MB on the same tree/data/machine — the entire
  // "graph-tier drift" the r12 verdict flagged). Standard setting for
  // codegen-heavy Spark drivers.
  "-XX:ReservedCodeCacheSize=512m",
)
