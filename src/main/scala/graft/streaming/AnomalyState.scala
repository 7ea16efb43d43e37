package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of q70's rolling z-score anomaly detection: per
  * event_type, state holds the trailing ≤100 values (a bounded ring — the
  * same bounded-state rule as the watermarked dedup; event_type
  * cardinality is small so no timeout is needed to cap total state), each
  * event is scored against the trailing mean/stddev BEFORE it enters the
  * ring, and only anomalies are emitted (append mode).
  *
  * Ordering: same in-order-per-key delivery assumption as
  * [[SessionState]] — events sort within a micro-batch, cross-batch order
  * comes from a time-ordered replay or key-partitioned source.
  *
  * Numerics: mean and sample variance are computed from the ring in
  * arrival order — the same frame the batch window aggregates — so stream
  * and batch agree to floating-point noise; the SessionStateSpec twin
  * test pins the flagged ids exactly and the scores to 1e-3.
  */
object AnomalyState {

  final case class ValueEvent(event_type: String, ts: Timestamp,
      event_id: Long, value: Double)
  final case class Trail(values: Seq[Double])
  final case class Anomaly(event_id: Long, event_type: String, value: Double,
      trailing_mean: Double, zscore: Double)

  final val WindowSize = 100
  final val MinTrail = 20L
  final val Threshold = 3.0

  def detect(key: String, events: Iterator[ValueEvent],
      state: GroupState[Trail]): Iterator[Anomaly] = {
    val sorted = events.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
    var ring = state.getOption.map(_.values.toVector).getOrElse(Vector.empty)
    val out = Seq.newBuilder[Anomaly]
    sorted.foreach { e =>
      val n = ring.length
      if (n >= MinTrail) {
        val mu = ring.sum / n
        val sigma = math.sqrt(
          ring.map(x => (x - mu) * (x - mu)).sum / (n - 1))
        if (sigma > 0) {
          val z = (e.value - mu) / sigma
          if (math.abs(z) > Threshold)
            out += Anomaly(e.event_id, key, e.value, mu, z)
        }
      }
      ring = (ring :+ e.value).takeRight(WindowSize)
    }
    state.update(Trail(ring))
    out.result().iterator
  }

  /** Wire the detector over a streaming events frame. */
  def streamAnomalies(spark: SparkSession,
      events: Dataset[ValueEvent]): Dataset[Anomaly] = {
    import spark.implicits._
    events
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        detect)
  }
}
