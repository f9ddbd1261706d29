package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming re-expression of the reference's daily events
  * DAG (reference tasks/bigquery.py daily_run: events → unnested →
  * aggregates, run once per day by Airflow). As a stream, the same
  * transforms run continuously with watermarked event time instead of
  * date-partitioned batch jobs.
  */
object EventsStream {

  /** Watermarked tumbling-window counts per event_type — the streaming
    * analogue of the daily active/event count jobs. */
  def windowedCounts(events: DataFrame, window_ : String = "1 hour", watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  case class Ev(user_id: Long, ts: java.sql.Timestamp, event_type: String, value: Double)
  case class SessionState(start: Long, last: Long, n: Long)
  case class SessionOut(user_id: Long, session_start_us: Long, session_len_us: Long, n_events: Long)

  /** Stateful sessionization with a 30-minute inactivity timeout —
    * the streaming analogue of the LEAD-based batch sessionize
    * (reference sql/mango_user_rfe_daily_session.sql), expressed with
    * flatMapGroupsWithState.
    *
    * State is BOUNDED: event-time timeout against the watermark closes
    * a user's final session (`setTimeoutTimestamp(last + gap)`, capped
    * below by watermark+1 so late-but-admissible events can't register
    * a timeout in the past) and removes the state entry — without
    * this, every user's last session would sit in the state store
    * forever. On a batch Dataset (spec convenience) timeouts never
    * fire, so the final open session stays unemitted — streaming is
    * the real surface.
    *
    * @param watermark how long to admit late events; also how long
    *                  after the session's closing gap the timeout can
    *                  lag. Should be >= the expected lateness bound.
    */
  def sessionize(
      events: Dataset[Ev],
      gapUs: Long = 30L * 60 * 1000 * 1000,
      watermark: String = "30 minutes"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val isStreaming = events.isStreaming
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (uid: Long, evs: Iterator[Ev], state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            // watermark passed last+gap with no new events: the session
            // is final — emit it and DROP the state entry
            val st = state.get
            state.remove()
            Iterator.single(SessionOut(uid, st.start, st.last - st.start, st.n))
          } else {
            // gap-split state machine: emit a session whenever the gap
            // between consecutive events exceeds gapUs.
            // MEMORY BOUND: this buffers ONE user's events for ONE
            // micro-batch (they arrive unsorted, and gap-splitting
            // needs time order — a sort requires materializing the
            // group). The bound is per-user-per-batch, set by trigger
            // interval × the user's event rate, not by stream length;
            // a pathological single user is capped by the micro-batch,
            // not unbounded. The STATE entry stays O(1) regardless
            // (one SessionState per user). Production posture for
            // large state: [[configureRocksDbState]].
            // full-microsecond event time (getTime alone truncates the
            // sub-millisecond part the batch sessionizer keeps)
            def fullUs(e: Ev): Long =
              e.ts.getTime * 1000 + (e.ts.getNanos / 1000) % 1000
            val sorted = evs.toSeq.sortBy(e => (fullUs(e), e.user_id))
            var cur = state.getOption
            val out = scala.collection.mutable.ArrayBuffer[SessionOut]()
            sorted.foreach { e =>
              val us = fullUs(e)
              cur match {
                // a late-but-admissible CROSS-BATCH event can precede
                // the open session (us < st.start): clamp both ends so
                // the session never runs backwards and the timeout
                // never moves earlier than the true last event
                case Some(st) if us >= st.start - gapUs && us - st.last <= gapUs =>
                  cur = Some(SessionState(math.min(st.start, us),
                    math.max(st.last, us), st.n + 1))
                case Some(st) if us < st.start - gapUs =>
                  // older than the open session by more than the gap:
                  // a completed singleton session from the past
                  out += SessionOut(uid, us, 0L, 1L)
                case Some(st) =>
                  out += SessionOut(uid, st.start, st.last - st.start, st.n)
                  cur = Some(SessionState(us, us, 1))
                case None =>
                  cur = Some(SessionState(us, us, 1))
              }
            }
            cur.foreach { st =>
              state.update(st)
              if (isStreaming) {
                val target = st.last / 1000 + gapUs / 1000
                state.setTimeoutTimestamp(
                  math.max(target, state.getCurrentWatermarkMs() + 1))
              }
            }
            out.iterator
          }
        })
  }

  case class MatchSide(
      match_id: Long, side: Int, model: String, value: Double,
      ts: java.sql.Timestamp)
  /** Per-match state: an open half waiting for its opponent, or —
    * once `done` — a tombstone marking an already-emitted match so a
    * re-delivered side inside the admissible window cannot re-form
    * the pair and emit a duplicate. */
  case class PendingSide(
      side: Int, model: String, value: Double, tsMs: Long,
      done: Boolean = false)
  case class MatchOut(
      match_id: Long, model_a: String, model_b: String, wins_a: Long)

  /** Millis of a `withWatermark`-style delay string ("10 minutes",
    * "1 hour") — so operators that derive state-retention horizons
    * from their watermark argument hold state for the window the
    * CALLER chose, not a hardcoded one. */
  private[graft] def delayMs(s: String): Long = {
    // Spark's CalendarInterval parser accepts COMPOUND delays
    // ("1 hour 30 minutes") — summing only the first unit would derive
    // a state-retention horizon SHORTER than the watermark, evicting
    // tombstones while re-deliveries are still admissible. Sum every
    // unit and reject any unmatched residue so malformed strings still
    // throw instead of silently truncating.
    val re = "(\\d+)\\s*(millisecond|second|minute|hour|day|week)s?".r
    // mirror Spark's IntervalUtils leniency: an optional leading
    // "interval" token and separating commas are accepted by
    // withWatermark, so the SAME string must parse here too
    val str = s.trim.toLowerCase.stripPrefix("interval").replace(",", " ").trim
    val parts = re.findAllMatchIn(str).toSeq
    if (parts.isEmpty || re.replaceAllIn(str, "").trim.nonEmpty)
      throw new IllegalArgumentException(s"unparseable delay: '$s'")
    parts.map { m =>
      m.group(1).toLong * (m.group(2) match {
        case "millisecond" => 1L
        case "second"      => 1000L
        case "minute"      => 60L * 1000
        case "hour"        => 3600L * 1000
        case "day"         => 24L * 3600 * 1000
        case "week"        => 7L * 24 * 3600 * 1000
      })
    }.sum
  }

  /** STREAMING MATCH COMPLETION — the stateful-pairing half of the
    * arena family (#191/#192 are its batch aggregations): each match's
    * two sides can arrive in DIFFERENT micro-batches; state holds the
    * first-seen side per match_id until its opponent arrives, then the
    * completed match emits EXACTLY ONCE with the same winner semantics
    * as the batch `q_win_matrix` pairing (higher value wins, exact
    * tie → lexicographically smaller model; model_a < model_b in the
    * output). Same-model matches complete silently. An orphan half
    * (opponent never arrives) is EVICTED by event-time timeout once
    * one `watermark` delay passes its own event time — the horizon is
    * DERIVED from the watermark argument, so a caller passing
    * '10 minutes' holds orphan state for ten minutes, not a
    * hardcoded hour. State is O(1) per open match, not per stream.
    *
    * Exactly-once holds against duplicate deliveries inside the
    * admissible window: a completed match leaves a TOMBSTONE in state
    * (evicted by the same event-time timeout) so a re-delivery of
    * both sides cannot re-form the pair and emit twice. A replay
    * arriving after the watermark has evicted the tombstone is
    * dropped by the watermark itself before reaching the operator —
    * duplicates admissibly-late beyond that are out of contract
    * (the standard Structured Streaming state-retention bound).
    *
    * In batch mode (`sides.isStreaming == false`) every side of a key
    * reaches one invocation, so the operator degrades to the exact
    * batch pairing — StreamingSpec pins equivalence against
    * `q_win_matrix`'s totals. */
  def matchCompletion(
      sides: Dataset[MatchSide], watermark: String = "1 hour"): Dataset[MatchOut] = {
    import sides.sparkSession.implicits._
    val isStreaming = sides.isStreaming
    val horizonMs = delayMs(watermark)
    sides
      .withWatermark("ts", watermark)
      .groupByKey(_.match_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (m: Long, it: Iterator[MatchSide], state: GroupState[PendingSide]) => {
          // retention: one watermark delay past the row's own event
          // time, clamped above the current watermark so the timeout
          // is admissible
          def hold(eventMs: Long): Unit =
            if (isStreaming) state.setTimeoutTimestamp(
              math.max(eventMs + horizonMs, state.getCurrentWatermarkMs() + 1))
          if (state.hasTimedOut) {
            // opponent never arrived (or a tombstone aged out): evict
            state.remove()
            Iterator.empty
          } else if (state.getOption.exists(_.done)) {
            // match already emitted — swallow re-deliveries, keep the
            // tombstone until its timeout passes
            Iterator.empty
          } else {
            val pending = state.getOption
              .map(p => MatchSide(m, p.side, p.model, p.value,
                new java.sql.Timestamp(p.tsMs))).toSeq
            val rows = pending ++ it
            // first occurrence per side wins (duplicate deliveries of
            // a side are idempotent)
            val a = rows.find(_.side == 0)
            val b = rows.find(_.side == 1)
            (a, b) match {
              case (Some(x), Some(y)) =>
                // tombstone the completed match (see Scaladoc): a
                // later re-delivery of both sides finds `done` above
                // instead of re-pairing
                state.update(PendingSide(-1, "", 0.0,
                  math.max(x.ts.getTime, y.ts.getTime), done = true))
                hold(math.max(x.ts.getTime, y.ts.getTime))
                if (x.model == y.model) Iterator.empty
                else {
                  val winner =
                    if (x.value > y.value) x.model
                    else if (y.value > x.value) y.model
                    else if (x.model < y.model) x.model else y.model
                  val (ma, mb) =
                    if (x.model < y.model) (x.model, y.model)
                    else (y.model, x.model)
                  Iterator.single(
                    MatchOut(m, ma, mb, if (winner == ma) 1L else 0L))
                }
              case _ =>
                val p = (a orElse b).get
                state.update(PendingSide(p.side, p.model, p.value,
                  p.ts.getTime))
                hold(p.ts.getTime)
                Iterator.empty
            }
          }
        })
  }

  /** Production state-store posture for stateful streams: the default
    * HDFS-backed provider keeps every state entry on the JVM heap —
    * fine for tests, an OOM risk when the keyspace is tens of millions
    * of users. RocksDB spills state off-heap to local disk and
    * changelog checkpointing uploads only per-batch deltas instead of
    * full snapshots. (Public Spark configuration; provider ships in
    * Spark 4.) Call before `.start()` — the provider is read at query
    * start. */
  def configureRocksDbState(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
  }

  /** Stream-stream INTERVAL join: each purchase attributed to the same
    * user's clicks from the preceding hour (the attribution join run
    * continuously instead of as a daily batch). Both sides carry
    * watermarks and the join condition bounds event-time distance, so
    * per-side buffered state is evicted once the watermark passes the
    * interval — bounded state on unbounded streams. */
  def clickPurchaseJoin(
      clicks: DataFrame, purchases: DataFrame,
      interval: String = "1 hour", watermark: String = "2 hours"): DataFrame = {
    val c = clicks.withWatermark("ts", watermark)
      .select(col("user_id"), col("ts").as("click_ts"), col("value").as("click_value"))
    val p = purchases.withWatermark("ts", watermark)
      .select(col("user_id").as("p_user_id"), col("ts").as("purchase_ts"),
        col("value").as("purchase_value"))
    c.join(p,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $interval"))
      .select(col("user_id"), col("click_ts"), col("purchase_ts"),
        col("click_value"), col("purchase_value"))
  }

  /** STREAM-STATIC dimension enrichment: join the event stream
    * against a static dimension frame (country/tracker/market tables
    * — the reference's per-day dim joins, continuous). The static
    * side is re-planned per micro-batch and BROADCAST, so the
    * stream side never shuffles and no streaming state is created —
    * this composes with watermarks/aggregations downstream without
    * restriction (unlike stream-stream joins). Left join: events
    * with no dim row pass through with nulls, the same IFNULL
    * posture as the batch attribution join. */
  case class CdcOp(key: Long, us: Long, event_id: Long, op: String,
    event_type: String, value: Double)
  case class CdcState(us: Long, event_id: Long, op: String,
    event_type: String, value: Double)
  case class CdcOut(key: Long, op: String, event_type: String, value: Double)

  /** STREAMING CDC APPLY — the continuous face of the batch #142
    * operator: a change log (upsert/delete ops per key, sequenced by
    * (us, event_id)) maintained as keyed state, emitting each key's
    * CURRENT state whenever a micro-batch changes it. Downstream, a
    * snapshot sink materializes the continuously-current table; a 'D'
    * current state is emitted as a tombstone row so consumers can
    * retract.
    *
    * State is one fixed-size record per key (the last operation) —
    * O(keys), no growth with log length; out-of-order operations
    * within the admissible window are resolved by the sequence
    * compare, so replayed or late log entries never regress state. */
  def cdcStream(log: Dataset[CdcOp]): Dataset[CdcOut] = {
    import log.sparkSession.implicits._
    log.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (key: Long, ops: Iterator[CdcOp], state: GroupState[CdcState]) => {
          val incoming = ops.maxBy(o => (o.us, o.event_id))
          val best = state.getOption match {
            case Some(cur) if cur.us > incoming.us ||
              (cur.us == incoming.us && cur.event_id >= incoming.event_id) => cur
            case _ => CdcState(incoming.us, incoming.event_id, incoming.op,
              incoming.event_type, incoming.value)
          }
          if (state.getOption.contains(best)) Iterator.empty // no change: emit nothing
          else {
            state.update(best)
            Iterator.single(CdcOut(key, best.op, best.event_type, best.value))
          }
        })
  }

  def enrichWithDims(stream: DataFrame, dims: DataFrame, key: String): DataFrame =
    stream.join(org.apache.spark.sql.functions.broadcast(dims), Seq(key), "left")

  /** STREAMING VOLUME-ANOMALY MONITOR — the continuous sibling of the
    * batch median/MAD detector (queries/Operational.anomalyMad):
    * watermarked tumbling-window counts per event_type, flagged
    * against a STATIC baseline frame `(event_type, med, mad)`
    * trained by the batch job. The baseline joins broadcast (no
    * streaming state beyond the window agg, so watermark semantics
    * are unchanged); window counts beyond `k`×MAD of the stored
    * median flag `is_anomaly`. Types with no baseline row pass
    * through unflagged (left join, NULL-safe flag) rather than
    * crashing the stream on a new event type — the
    * new-data-never-kills-the-pipeline posture of the batch
    * validation family. */
  def volumeAnomaly(
      events: DataFrame, baseline: DataFrame,
      window_ : String = "1 hour", watermark: String = "2 hours",
      k: Double = 3.0): DataFrame =
    windowedCounts(events, window_, watermark)
      .join(org.apache.spark.sql.functions.broadcast(baseline), Seq("event_type"), "left")
      .select(col("window_start"), col("event_type"), col("n_events"),
        when(col("med").isNotNull &&
            abs(col("n_events") - col("med")) > col("mad") * k + lit(1e-9), 1)
          .otherwise(0).as("is_anomaly"))

  /** foreachBatch sink: applies the batch writer to each micro-batch —
    * the streaming analogue of the reference's per-day load step
    * (daily partitioned append becomes continuous micro-batch
    * upsert). */
  def foreachBatchParquet(df: DataFrame, path: String, checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batch.write.mode("append").parquet(path)
      }
      .start()

  /** The IDEMPOTENT micro-batch writer behind
    * [[foreachBatchExactlyOnce]], exposed for direct testing: each
    * batch lands in its own `__batch=<id>` partition via dynamic
    * partition OVERWRITE, so a batch REPLAYED after a failure
    * between data write and checkpoint commit rewrites its own
    * partition instead of appending a duplicate copy. */
  def idempotentBatchWriter(path: String)(
      batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long): Unit =
    batch.withColumn("__batch", org.apache.spark.sql.functions.lit(id))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("__batch")
      .parquet(path)

  /** EXACTLY-ONCE foreachBatch parquet sink: foreachBatch alone is
    * at-least-once (a crash between the batch write and the
    * checkpoint commit replays the batch — [[foreachBatchParquet]]'s
    * plain append would duplicate it). Keying the write by batch id
    * and dynamically overwriting only that partition makes the
    * replay idempotent — the standard Structured Streaming
    * exactly-once file-sink recipe when the built-in file sink's
    * log can't be used (e.g. writing through the upsert path). */
  def foreachBatchExactlyOnce(df: DataFrame, path: String, checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch(idempotentBatchWriter(path) _)
      .start()

  /** VERSIONED exactly-once sink: each micro-batch commits a new
    * [[graft.sources.Snapshots]] version keyed by its batch id —
    * replayed batches are no-ops (the manifest remembers the last
    * batch id), and every micro-batch becomes a time-travel point a
    * reader can pin while the stream keeps committing. */
  def foreachBatchSnapshot(df: DataFrame, root: String, checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        graft.sources.Snapshots.commitBatch(batch.toDF(), root, id): Unit
      }
      .start()

  /** Batch-drive a streaming query over a parquet directory for tests:
    * memory sink + processAllAvailable. */
  def runOnce(spark: SparkSession, df: DataFrame, name: String): DataFrame = {
    val q = df.writeStream
      .outputMode(OutputMode.Append)
      .format("memory")
      .queryName(name)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }
}
