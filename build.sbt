ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "pagerankopenmpdynamicspark"
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
// Forked run output must reach stdout BARE (no sbt "[info] " prefix): the
// round driver parses graft.Bench's single JSON line from stdout, and the
// log-routed form is unparseable (BENCH_r01.json had "parsed": null).
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  // Fixed-size, pre-touched heap: with the default tiny -Xms, G1 UNCOMMITS
  // the heap back to ~2G at every explicit Full GC (Bench settles between
  // measurement runs with System.gc()) and then re-expands toward -Xmx
  // DURING the next measured window — multi-GB page commit + zeroing billed
  // to supersteps, plus multi-second young-evacuation pauses while G1's
  // adaptive sizing re-learns from scratch each run (observed: 65 s of GC
  // pauses, max 6.8 s, in one 20-min bench run; the first scaling pair of
  // every run was systematically the worst). Xms=Xmx stops the
  // commit/uncommit cycling; AlwaysPreTouch moves the one-time zeroing cost
  // to JVM startup, outside any measured window.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  "-XX:+AlwaysPreTouch",
  // JDK-8192647: with 32 executor threads in JNI-critical sections (shuffle
  // compression) a GCLocker-starved allocation can throw a SPURIOUS OOM
  // after the default 2 retries even with heap to spare — observed once as
  // "Retried waiting for GCLocker too often allocating 125002 words" killing
  // a 48g-heap bench run. Standard mitigation: raise the retry count
  // (diagnostic flag — needs unlocking).
  "-XX:+UnlockDiagnosticVMOptions",
  "-XX:GCLockerRetryAllocationCount=100",
) ++ sys.env.get("GRAFT_EXTRA_JVM").map(_.split("\\s+").toSeq).getOrElse(Nil)
