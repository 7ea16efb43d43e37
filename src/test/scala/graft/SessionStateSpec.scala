package graft

import graft.streaming.{SessionState, Streaming}
import java.nio.file.Files
import org.apache.spark.sql.functions._

class SessionStateSpec extends SparkSpec {

  test("flatMapGroupsWithState sessions agree with the batch sessionizer") {
    import spark.implicits._
    // replay events as a stream: ONE time-sorted file — the file source
    // processes files in mod-time order, not event-time order, so a
    // multi-file replay would feed the gap fold out of order (see the
    // in-order-delivery note on SessionState)
    val dir = Files.createTempDirectory("sess_stream").toString
    Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"))
      .orderBy("ts", "event_id").coalesce(1)
      .write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = Streaming.parquetFileSource(spark, dir, schema)
      .as[SessionState.Event]
    Streaming.drainToMemory(
      SessionState.streamSessions(spark, stream).toDF(), "sessions_out")
    val streamed = spark.sql(
      """SELECT user_id, session_start, n_events, duration_sec
        |FROM sessions_out""".stripMargin)

    // the stream reads ts as TIMESTAMP (watermark requirement) while the
    // batch query keeps the table's native NTZ — same UTC wall clock, so
    // align types for exceptAll with a value-preserving cast
    val batch = SparkEntry.queries("q42_sessionize")(spark, sf)
      .select("user_id", "session_start", "n_events", "duration_sec")
      .withColumn("session_start", col("session_start").cast("timestamp"))

    // append mode emits only CLOSED sessions (timeout needs watermark
    // advance); every emitted session must exist in the batch result
    assert(streamed.count() > 0, "no sessions emitted")
    val disagree = streamed.exceptAll(batch).count()
    assert(disagree == 0, s"$disagree streamed sessions not in batch result")
  }

  test("stateful anomaly stream agrees with the q70 batch window") {
    import spark.implicits._
    import graft.streaming.AnomalyState
    // one time-sorted file, same in-order replay contract as the sessionizer
    val dir = Files.createTempDirectory("anom_stream").toString
    Tables.events(spark, sf)
      .select(col("event_type"), col("ts"), col("event_id"), col("value"))
      .orderBy("ts", "event_id").coalesce(1)
      .write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = Streaming.parquetFileSource(spark, dir, schema)
      .as[AnomalyState.ValueEvent]
    Streaming.drainToMemory(
      AnomalyState.streamAnomalies(spark, stream).toDF(), "anomalies_out")
    val streamed = spark.sql(
      "SELECT event_id, zscore FROM anomalies_out").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap

    val batch = SparkEntry.queries("q70_anomaly_zscore")(spark, sf).collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Double]("zscore")).toMap

    assert(batch.nonEmpty, "q70 found no anomalies at this SF — test is vacuous")
    assert(streamed.keySet == batch.keySet,
      s"flag sets differ: only-stream=${streamed.keySet -- batch.keySet}, " +
        s"only-batch=${batch.keySet -- streamed.keySet}")
    streamed.foreach { case (id, z) =>
      assert(math.abs(z - batch(id)) < 1e-3, s"z drift on $id: $z vs ${batch(id)}")
    }
  }

  test("session fold: gap closes a session, within-gap extends it") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val events = Iterator(
      SessionState.Event(1L, ts("2024-01-01 10:00:00"), 1),
      SessionState.Event(1L, ts("2024-01-01 10:10:00"), 2),
      SessionState.Event(1L, ts("2024-01-01 11:30:00"), 3)) // > 30 min gap
    // drive the pure fold with Spark's official TestGroupState factory
    val state = org.apache.spark.sql.streaming.TestGroupState.create[SessionState.OpenSession](
      org.apache.spark.api.java.Optional.empty[SessionState.OpenSession](),
      org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout,
      1000L,
      org.apache.spark.api.java.Optional.of(0L),
      false)
    val closed = SessionState.sessionize(1L, events, state).toSeq
    assert(closed.length == 1)
    assert(closed.head.n_events == 2) // first session had events 1+2
    assert(state.getOption.exists(_.nEvents == 1)) // open session = event 3
  }
}
