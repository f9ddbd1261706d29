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
      // provoke the ContextCleaner: shuffle files and broadcast blocks
      // of FINISHED queries are only reclaimed when their dependency
      // objects are garbage-collected, and in one long-lived JVM that
      // lags hundreds of queries behind — the accumulated tmpfs
      // shuffle dirs and block-manager entries are a chunk of the
      // in-suite vs standalone gap on the heavy graph queries. Runs
      // OUTSIDE the timed window.
      System.gc()
    }
    // Warmup at the smallest SF: identical plans → whole-stage codegen
    // classes, shuffle machinery and JIT are hot before timing, so the
    // measurement reflects data-processing throughput, not JVM startup.
    val warmDir = "/root/testdata/sf0.001"
    SparkEntry.queries.foreach { case (_, fn) =>
      try run(fn, warmDir) catch { case _: Throwable => () }
      cleanup()
    }
    // Self-calibration: a fixed CPU-bound task timed at the endpoints
    // and through the run, plus /proc/loadavg at both ends. On an idle
    // box all calibration timings agree across runs; a loaded-box
    // artifact (BENCH_r04: 251 s driver capture vs 168 s committed)
    // becomes self-evident from an inflated calibration or loadavg
    // instead of needing an after-the-fact re-timing.
    def spin(seed: Long): Unit = {
      var x = seed
      var i = 0
      while (i < 300000000) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; i += 1 }
      if (x == 42L) print("") // keep the loop live under JIT
    }
    // single-threaded probe: JIT / clock-speed sanity
    def calibrate(): Double = {
      val t0 = System.nanoTime()
      spin(0x9E3779B97F4A7C15L)
      (System.nanoTime() - t0) / 1e9
    }
    // ALL-CORES probe: one spin thread per configured CPU, wall time.
    // This is the probe that actually sees what the queries see — the
    // r6 AND r7 artifacts were inflated by background load that the
    // 1-thread probe provably could not detect (a competing process
    // leaves 31 of 32 cores untouched; a 32-way-parallel stage loses
    // proportional throughput). Idle box: wall ≈ single-thread time;
    // contended box: wall inflates by the stolen-core fraction.
    def calibratePar(): Double = {
      val n = math.max(1, cpus.toInt)
      val t0 = System.nanoTime()
      val ts = (0 until n).map { t =>
        val th = new Thread(() => spin(0x9E3779B97F4A7C15L + t))
        th.start(); th
      }
      ts.foreach(_.join())
      (System.nanoTime() - t0) / 1e9
    }
    def loadavg(): Double =
      try scala.io.Source.fromFile("/proc/loadavg").mkString
        .split(" ")(0).toDouble
      catch { case _: Throwable => -1.0 }
    // Calibration SERIES: BOTH probes interleaved every `calibEvery`
    // queries (outside the per-query timed windows), so a mid-run load
    // spike localizes to the queries it actually hit — with only
    // endpoint calibration, one spike invalidated the whole artifact
    // two driver rounds running. Entry: (next-query run-order index,
    // single-thread secs, all-cores wall secs).
    val calibEvery = 25
    final case class Attempt(
        results: Map[String, Double],
        series: Seq[(Int, Double, Double)],
        calibFirst: Double, calibLast: Double,
        parFirst: Double, parLast: Double,
        loadStart: Double, loadEnd: Double,
        retimed: Map[String, Double] = Map.empty,
        disputed: Seq[String] = Seq.empty) {
      // contention score: spread of the all-cores probe across the
      // run, ROBUST to a single blip (the probe shares the box with
      // the bench JVM's own GC/netty threads, which cost one isolated
      // ~1.4x outlier even on an idle box): second-highest sample over
      // the median. Flat ≈ 1.0 means no external load touched any
      // timed segment; sustained pollution (the r6/r7 artifact shape —
      // many inflated samples) stays far above the threshold.
      def parRatio: Double = {
        val ps = (series.map(_._3) ++ Seq(parFirst, parLast)).sorted
        if (ps.isEmpty || ps.head <= 0) Double.MaxValue
        else ps(math.max(0, ps.size - 2)) / ps(ps.size / 2)
      }
      // loadavg is NOT part of the criterion: the bench's own 32
      // executor threads dominate it (a heavy final query legitimately
      // leaves loadavg_end > start+1), so it would flag clean runs.
      // Both loadavgs stay in the artifact as context; the all-cores
      // probe directly measures the CPU actually available to the
      // timed windows, which is the thing that matters.
      def clean: Boolean = parRatio <= 1.3
    }
    // two timed passes per attempt, report per-query min: single-pass
    // numbers on a shared machine carry ±80% scheduler noise; min-of-2
    // is the repeatable steady-state figure
    //
    // VARIANCE GUARD for the heavy composed gates (the r10 lesson:
    // q_curation_week swung 14 s -> 19.7 s with no way to tell box
    // noise from a real day-cost regression): a query whose two passes
    // DISAGREE past 25% while costing > 5 s gets up to two targeted
    // re-times, stopping as soon as the two LOWEST samples agree
    // within 25% — agreement means that figure is the repeatable
    // steady state; a query whose samples never converge is flagged
    // in the artifact (`disputed`) so a persistent swing is visible
    // instead of being silently masked by a min-of-4. Re-timed names
    // + final figures are published (`retimed`) so the adjudication
    // is data, not inference.
    def attempt(): Attempt = {
      val series = scala.collection.mutable.ArrayBuffer.empty[(Int, Double, Double)]
      def timeOne(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
        val t0 = System.nanoTime()
        try { run(fn, sfDir) } catch { case _: Throwable => () }
        val dt = (System.nanoTime() - t0) / 1e9
        cleanup()
        dt
      }
      def timed(pass: Int): Map[String, Double] =
        SparkEntry.queries.zipWithIndex.map { case ((name, fn), i) =>
          if (i % calibEvery == 0)
            series += ((pass * SparkEntry.queries.size + i,
              calibrate(), calibratePar()))
          name -> timeOne(fn)
        }.toMap
      val (cF, pF, lS) = (calibrate(), calibratePar(), loadavg())
      val (r1, r2) = (timed(0), timed(1))
      val retimed = scala.collection.mutable.Map.empty[String, Double]
      val disputed = scala.collection.mutable.ArrayBuffer.empty[String]
      val merged = r1.map { case (k, v) =>
        val samples = scala.collection.mutable.ArrayBuffer(v, r2(k))
        def lowTwoAgree: Boolean = {
          val s = samples.sorted
          s(1) / math.max(s(0), 1e-9) <= 1.25
        }
        if (samples.min > 5.0 && !lowTwoAgree) {
          var tries = 2
          while (tries > 0 && !lowTwoAgree) {
            samples += timeOne(SparkEntry.queries(k))
            tries -= 1
          }
          retimed(k) = samples.min
          if (!lowTwoAgree) disputed += k
        }
        k -> samples.min
      }
      val (cL, pL, lE) = (calibrate(), calibratePar(), loadavg())
      Attempt(merged, series.toSeq, cF, cL, pF, pL, lS, lE,
        retimed.toMap, disputed.toSeq)
    }
    // COMMIT POLICY (the r6/r7 lesson, now enforced in the harness
    // itself): if the attempt's all-cores calibration is not flat —
    // external load polluted some timed segment — rerun the whole
    // measurement (bounded by SPARK_GRAFT_BENCH_ATTEMPTS, default 2)
    // and publish the CLEANEST attempt (lowest parallel-probe spread),
    // never the last one.
    val maxAttempts = sys.env.getOrElse("SPARK_GRAFT_BENCH_ATTEMPTS", "2").toInt
    val attempts = scala.collection.mutable.ArrayBuffer(attempt())
    while (attempts.size < maxAttempts && !attempts.last.clean)
      attempts += attempt()
    val best = attempts.minBy(_.parRatio)
    val results = best.results
    import best.{calibFirst, calibLast, loadStart, loadEnd}
    // PER-DAY WEEK BREAKDOWN in the artifact — the q_curation_week
    // adjudication data (r10's weak mark: a 41% swing in the composed
    // 7-day gate that nobody could attribute): each absorbDaily +
    // nightly of the week gate timed separately on a scratch root at
    // the bench SF, so a real day-cost regression localizes to a day
    // and a busy box shows up as uniform inflation against the
    // calibration series. Runs OUTSIDE the headline totals.
    val weekDays: Seq[(Double, Double)] =
      if (sys.env.getOrElse("SPARK_GRAFT_BENCH_WEEKDAYS", "1") != "1") Seq.empty
      else try {
        import org.apache.spark.sql.functions.col
        val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
          .select(col("doc_id"), col("text")).localCheckpoint()
        val wbase = java.nio.file.Files
          .createTempDirectory("graft-benchweek").toString
        val (curatedRoot, lshRoot) = (s"$wbase/curated", s"$wbase/lsh")
        graft.sources.Snapshots.commit(corpus, curatedRoot)
        graft.dedup.LshIndex.build(corpus, lshRoot)
        val days = (0 until 7).map { d =>
          val batch = graft.queries.Indexing.weekBatch(corpus, d).localCheckpoint()
          val t0 = System.nanoTime()
          graft.tools.FullEval.run(graft.pipelines.CurationJob
            .absorbDaily(batch, curatedRoot, lshRoot, batchId = d.toLong))
          val tIngest = (System.nanoTime() - t0) / 1e9
          val t1 = System.nanoTime()
          graft.pipelines.CurationJob.nightly(spark, curatedRoot, lshRoot, keep = 3)
          (tIngest, (System.nanoTime() - t1) / 1e9)
        }
        cleanup()
        days
      } catch { case _: Throwable => Seq.empty }
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
    // calib_series: [[queryIndexInRunOrder, 1-thread secs, all-cores
    // wall secs], ...] across both timed passes of the PUBLISHED
    // attempt — both series flat means the whole artifact is clean; an
    // inflated segment names exactly which queries a load spike hit
    val series = best.series
      .map { case (i, v, p) => s"[$i,${ms(v)},${ms(p)}]" }.mkString("[", ",", "]")
    // re-timed heavy queries (variance guard) + the week per-day
    // breakdown ride the SHORT line too — both are the adjudication
    // data for the composed gates and total a few hundred bytes
    val retimedObj = obj(best.retimed.toSeq.sortBy(_._1))
    val weekObj = weekDays
      .map { case (i, n) => s"[${ms(i)},${ms(n)}]" }.mkString("[", ",", "]")
    // WEEK-DAY OUTLIER marking (the r11 artifact lesson: a clean:true
    // line carried a 27.7 s day-5 nightly that was pure external load,
    // and nothing in the artifact said so): flag any day AFTER the
    // median window (days 3+) whose ingest or nightly exceeds 3x the
    // median of days 0-2 (+2 s absolute floor so a tiny median cannot
    // flag noise) — the EXACT bound CurationWeekCostSpec asserts in
    // CI (same floor, same flagged-day set), so a flagged day here
    // means either a real day-cost regression (the spec fails too) or
    // load that hit exactly that window (the calib series localizes
    // it) — never a day CI would accept.
    val weekOutliers: Seq[Int] =
      if (weekDays.size < 4) Seq.empty
      else {
        def med3(f: ((Double, Double)) => Double) = {
          val s = weekDays.take(3).map(f).sorted; s(1)
        }
        val (mi, mn) = (med3(_._1), med3(_._2))
        weekDays.zipWithIndex.drop(3).collect {
          case ((i, n), d) if i > 3 * mi + 2.0 || n > 3 * mn + 2.0 => d
        }
      }
    val disputedArr = best.disputed.sorted.map("\"" + _ + "\"")
      .mkString("[", ",", "]")
    val scalars =
      s""""metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"sf":"$sfDir","attempts":${attempts.size},"clean":${best.clean},"calib_par_ratio":${ms(best.parRatio)},"calib_first_sec":${ms(calibFirst)},"calib_last_sec":${ms(calibLast)},"calib_par_first_sec":${ms(best.parFirst)},"calib_par_last_sec":${ms(best.parLast)},"loadavg_start":$loadStart,"loadavg_end":$loadEnd,"n_retimed":${best.retimed.size},"retimed":$retimedObj,"disputed":$disputedArr,"week_days_ingest_nightly":$weekObj,"week_day_outliers":${weekOutliers.mkString("[", ",", "]")}"""
    val json =
      s"""{$scalars,"calib_series":$series,"slowest":$slow,"queries":$qs}"""
    // durable copy the driver can read whole even if stdout is capped —
    // BOTH a per-core-count file (the r13 PERF seam: the 8-core scaling
    // run overwrote BENCH_LATEST.json before the 32-core run could be
    // paired with it, leaving per_query/geomean empty) and the legacy
    // fixed name for consumers that read it
    for (name <- Seq("BENCH_LATEST.json", s"BENCH_LATEST_c$cpus.json"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(name),
        (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
    // LAST line on stdout, after all Spark shutdown chatter. It now
    // carries the FULL per-query map (r13 verdict Next #2: PERF could
    // not compute per-query regressions/geomean from driver artifacts);
    // at 3 decimals the map is ~6.5 KB. To keep the line under the ~8 KB
    // tail-capture bound that truncated earlier rounds, the redundant
    // "slowest" block (derivable from the map) and the calib series stay
    // file-only; scalars ride FIRST so even a truncated capture keeps
    // the totals.
    println(s"""{$scalars,"queries":$qs,"full":"BENCH_LATEST_c$cpus.json"}""")
  }
}
