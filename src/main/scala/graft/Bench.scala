package graft
import org.apache.spark.sql.SparkSession

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      // tmpfs shuffle dirs (see GraftSession.localDir): on this host
      // /tmp is a virtual disk whose writeback variance swung heavy
      // shuffle queries 3-8x between otherwise identical runs
      .config("spark.local.dir", GraftSession.localDir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // FULL-evaluation action shared by every timing harness — see
    // graft.tools.FullEval for why count() is not equivalent.
    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
        dir: String): Unit =
      graft.tools.FullEval.run(fn(spark, dir))
    // Drop blocks a finished query left behind: localCheckpoint /
    // persist blocks are never freed by the queries themselves (the
    // returned frame depends on them), so over 3 × 206 evaluations
    // they accrue until storage eviction churn bleeds into execution —
    // the source of the 3-8× graph-family swings between otherwise
    // idle-box runs (q_edge_jaccard 6.6 s vs 29.7 s min-of-2). Runs
    // OUTSIDE the timed window.
    def cleanup(): Unit = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      spark.sharedState.cacheManager.clearCache()
    }
    // Warmup at the smallest SF: identical plans → whole-stage codegen
    // classes, shuffle machinery and JIT are hot before timing, so the
    // measurement reflects data-processing throughput, not JVM startup.
    val warmDir = "/root/testdata/sf0.001"
    SparkEntry.queries.foreach { case (_, fn) =>
      try run(fn, warmDir) catch { case _: Throwable => () }
      cleanup()
    }
    // Self-calibration: a fixed single-threaded CPU-bound task timed
    // at the endpoints and through the run, plus /proc/loadavg at both
    // ends. On an idle box all calibration timings agree across runs;
    // a loaded-box artifact (BENCH_r04: 251 s driver capture vs 168 s
    // committed) becomes self-evident from an inflated calibration or
    // loadavg instead of needing an after-the-fact re-timing.
    def calibrate(): Double = {
      val t0 = System.nanoTime()
      var x = 0x9E3779B97F4A7C15L
      var i = 0
      while (i < 300000000) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; i += 1 }
      if (x == 42L) print("") // keep the loop live under JIT
      (System.nanoTime() - t0) / 1e9
    }
    // Calibration SERIES: the fixed single-threaded CPU task is
    // interleaved every `calibEvery` queries (outside the per-query
    // timed windows), so a mid-run load spike localizes to the
    // queries it actually hit — with only endpoint calibration, one
    // spike invalidated the whole artifact two driver rounds running.
    // Each entry is (index of the next query in run order, seconds).
    val calibSeries = scala.collection.mutable.ArrayBuffer.empty[(Int, Double)]
    val calibEvery = 25
    // two timed passes, report per-query min: single-pass numbers on a
    // shared machine carry ±80% scheduler noise; min-of-2 is the
    // repeatable steady-state figure
    def timed(pass: Int): Map[String, Double] =
      SparkEntry.queries.zipWithIndex.map { case ((name, fn), i) =>
        if (i % calibEvery == 0)
          calibSeries += ((pass * SparkEntry.queries.size + i, calibrate()))
        val t0 = System.nanoTime()
        try { run(fn, sfDir) } catch { case _: Throwable => () }
        val dt = (System.nanoTime() - t0) / 1e9
        cleanup()
        name -> dt
      }.toMap
    def loadavg(): Double =
      try scala.io.Source.fromFile("/proc/loadavg").mkString
        .split(" ")(0).toDouble
      catch { case _: Throwable => -1.0 }
    val (calibFirst, loadStart) = (calibrate(), loadavg())
    val (r1, r2) = (timed(0), timed(1))
    val (calibLast, loadEnd) = (calibrate(), loadavg())
    val results = r1.map { case (k, v) => k -> math.min(v, r2(k)) }
    // stable key order; scalar fields FIRST, then the 10 slowest, then
    // the full map — a consumer that truncates the line tail still gets
    // the total and the queries that matter; times at 3 decimals keep
    // the whole line a few KB (the r3 driver capture truncated the
    // full-precision map and recorded parsed:null)
    def ms(v: Double): String = BigDecimal(v)
      .setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    def obj(kvs: Seq[(String, Double)]): String =
      kvs.map { case (k, v) => "\"" + k + "\":" + ms(v) }.mkString("{", ",", "}")
    val qs = obj(results.toSeq.sortBy(_._1))
    val slow = obj(results.toSeq.sortBy(-_._2).take(10))
    // "value" is the sum of the per-query entries AS PUBLISHED (3dp),
    // so a consumer cross-checking value == Σ queries sees an exact
    // match instead of up-to-n·0.5ms rounding drift
    val total =
      if (results.isEmpty) BigDecimal(0)
      else results.values.map(v => BigDecimal(ms(v))).sum
    // calib_series: [[queryIndexInRunOrder, seconds], ...] across both
    // timed passes — a flat series means the whole artifact is clean;
    // an inflated segment names exactly which queries a load spike hit
    val series = calibSeries
      .map { case (i, v) => s"[$i,${ms(v)}]" }.mkString("[", ",", "]")
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"sf":"$sfDir","calib_first_sec":${ms(calibFirst)},"calib_last_sec":${ms(calibLast)},"calib_series":$series,"loadavg_start":$loadStart,"loadavg_end":$loadEnd,"slowest":$slow,"queries":$qs}"""
    // durable copy the driver can read whole even if stdout is capped
    java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_LATEST.json"),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
    // LAST line on stdout, after all Spark shutdown chatter
    println(json)
  }
}
