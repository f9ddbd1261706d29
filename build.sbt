ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "taipeibietlspark"
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
// No "[success] Total time: ..." epilogue and no "[info] " line
// prefixes on forked-run output: Bench/Verify print one JSON line as
// the LAST stdout line and the driver parses exactly that — sbt's
// success banner after it (and its logger prefix on it) broke the
// parse four rounds running.
Global / showSuccess := false
Global / excludeLintKeys += showSuccess
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
// local[32] on a 128 GiB box: 8g starves 32 concurrent build-side
// hash maps (graph joins at probe scale); 32g leaves headroom for
// the OS cache and any concurrent sbt session. SPARK_DRIVER_MEM
// overrides both bounds.
val driverMaxHeap = sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")
// Pre-size the heap (-Xms = -Xmx): without it the adaptive heap
// starts at 2g and each run grows it on a different trajectory — runs
// where it stays small GC-thrash the wedge-explosion stages, which is
// how identical graph-query runs swung 3-8x (q_triangle_count 5.4 s
// vs 21.7 s min-of-2) with flat CPU calibration. But -Xms COMMITS the
// full heap at JVM start, so on a host with less free RAM than the
// 32g default the fixed pre-size would fail the launch outright —
// clamp the floor to what the host can actually commit (the benchmark
// box detects ≫32g and keeps the fixed-heap behavior; an explicit
// SPARK_DRIVER_MEM is always honored as given).
val driverMinHeap = sys.env.get("SPARK_DRIVER_MEM").getOrElse {
  val availGib =
    try {
      val meminfo = scala.io.Source.fromFile("/proc/meminfo")
      try meminfo.getLines()
        .collectFirst { case l if l.startsWith("MemAvailable:") =>
          l.split("\\s+")(1).toLong / (1024 * 1024) }
        .getOrElse(0L)
      finally meminfo.close()
    } catch { case _: Throwable => 0L }
  if (availGib >= 40) "32g" else s"${math.max(2L, availGib / 2)}g"
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx$driverMaxHeap",
  s"-Xms$driverMinHeap",
)
