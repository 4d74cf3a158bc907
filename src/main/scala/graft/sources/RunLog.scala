package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Run-level observability — the engine's counterpart of the reference's
  * per-run ETL log tree (`etl_pipeline_script.py:25-29` and
  * `logs/etl_logs/`): every pipeline run records its steps (name,
  * mutation counts from [[ParquetUpsertSink.SinkStats]], wall time,
  * failure) and emits ONE machine-parseable JSON record per run, written
  * as `run-<id>.json` under the log directory. A pipeline that can't say
  * what each run changed, how long each step took, and which step failed
  * can't be audited or alerted on.
  *
  * Driver-side only by design: a run has O(steps) records, never
  * O(rows) — the row-level work stays in the step bodies.
  */
final class RunLog(val runId: String) {
  import ParquetUpsertSink.SinkStats

  private case class StepRecord(name: String, stats: Option[SinkStats],
    millis: Long, error: Option[String])

  private val steps = scala.collection.mutable.ArrayBuffer.empty[StepRecord]
  private val startedMs = System.currentTimeMillis()

  /** Run `body` as a named step: wall time and its SinkStats are
    * recorded; a failure is recorded (step + error) and rethrown so the
    * run record shows WHERE the pipeline died.
    */
  def step(name: String)(body: => SinkStats): SinkStats = {
    val t0 = System.nanoTime()
    try {
      val st = body
      steps += StepRecord(name, Some(st), (System.nanoTime() - t0) / 1000000L,
        None)
      st
    } catch {
      case e: Throwable =>
        steps += StepRecord(name, None, (System.nanoTime() - t0) / 1000000L,
          Some(e.toString))
        throw e
    }
  }

  private def esc(s: String): String = s.flatMap {
    case '"'            => "\\\""
    case '\\'           => "\\\\"
    case c if c < ' '   => f"\\u${c.toInt}%04x"
    case c              => c.toString
  }

  /** The run record as one JSON line. */
  def toJson: String = {
    val stepJson = steps.map { r =>
      val stats = r.stats.map(x =>
        s""","inserted":${x.inserted},"updated":${x.updated}""" +
          s""","deleted":${x.deleted}""").getOrElse("")
      val err = r.error.map(e => s""","error":"${esc(e)}"""").getOrElse("")
      s"""{"step":"${esc(r.name)}","millis":${r.millis}$stats$err}"""
    }.mkString("[", ",", "]")
    val ok = steps.forall(_.error.isEmpty)
    s"""{"run_id":"${esc(runId)}","started_ms":$startedMs,"ok":$ok,""" +
      s""""n_steps":${steps.size},"steps":$stepJson}"""
  }

  /** Write the record to `logDir/run-<id>.json` (one file per run, like
    * the reference's dated log files — no append needed, so it works on
    * object stores too). Returns the written path.
    */
  def write(spark: SparkSession, logDir: String): String = {
    val p = new Path(logDir, s"run-$runId.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write((toJson + "\n").getBytes("UTF-8")) finally out.close()
    p.toString
  }
}
