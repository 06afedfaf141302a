package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.util.QueryExecutionListener
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

  /** Batch counterpart of the progress logger: one line per completed
    * action with wall time and scan volume, from the executed plan's own
    * metrics (no extra instrumentation in query code — semantics
    * untouched, telemetry only). The last event is kept on the listener
    * so tests and harnesses can assert on it.
    */
  final class BatchMetricsListener extends QueryExecutionListener {
    @volatile var lastSuccess: Option[(String, Long, Long)] = None // (fn, wallNs, rowsProcessed)

    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      // AQE wrappers (AdaptiveSparkPlanExec, QueryStageExec) are leaf
      // nodes whose real plan hangs off a field, so a plain collect sees
      // nothing — descend through them explicitly. Row counts also live on
      // different nodes per plan shape (columnar scans count on
      // ColumnarToRow), so sum across every node carrying the metric.
      def allNodes(p: SparkPlan): Seq[SparkPlan] = p match {
        case a: AdaptiveSparkPlanExec => p +: allNodes(a.executedPlan)
        case q: QueryStageExec => p +: allNodes(q.plan)
        case other => other +: other.children.flatMap(allNodes)
      }
      val rows = allNodes(qe.executedPlan)
        .flatMap(_.metrics.get("numOutputRows").map(_.value))
        .sum
      lastSuccess = Some((funcName, durationNs, rows))
      log.info(s"batch query ok: fn=$funcName wallMs=${durationNs / 1000000} rowsProcessed=$rows")
    }

    override def onFailure(funcName: String, qe: QueryExecution, error: Exception): Unit =
      log.warn(s"batch query failed: fn=$funcName", error)
  }

  /** Register a [[BatchMetricsListener]]; returns it for assertion /
    * deregistration (`spark.listenerManager.unregister`).
    */
  def attachBatchMetricsLogger(spark: SparkSession): BatchMetricsListener = {
    val l = new BatchMetricsListener
    spark.listenerManager.register(l)
    l
  }
}
