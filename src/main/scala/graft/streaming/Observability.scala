package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.slf4j.LoggerFactory

/** Observability (reference O4/O5, SURVEY.md §2.5): the reference wraps
  * each job in a New Relic `@Trace` span and logs per-record lines; the
  * Spark-native equivalents are a [[StreamingQueryListener]] publishing
  * per-micro-batch progress (rows/sec, batch duration, watermark, state
  * size) and Spark's own metrics system / UI for task-level detail.
  * Semantics are unchanged by observability — this is telemetry only.
  */
object Observability {

  private val log = LoggerFactory.getLogger(getClass)

  /** Per-micro-batch progress logger; returns the listener so callers
    * (tests, harnesses) can remove it again.
    */
  def attachProgressLogger(spark: SparkSession): StreamingQueryListener = {
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
        log.info(s"stream started: name=${e.name} id=${e.id}")

      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        log.info(s"stream progress: name=${p.name} batch=${p.batchId} " +
          s"rows=${p.numInputRows} rows/s=${p.processedRowsPerSecond} " +
          s"durationMs=${p.batchDuration}")
      }

      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        log.info(s"stream terminated: id=${e.id} exception=${e.exception.getOrElse("none")}")
    }
    spark.streams.addListener(listener)
    listener
  }
}
