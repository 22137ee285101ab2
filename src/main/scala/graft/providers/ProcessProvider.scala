package graft.providers

import java.io.{BufferedReader, InputStreamReader, OutputStreamWriter}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.json4s._
import org.json4s.JsonDSL._
import org.json4s.jackson.JsonMethods._

import graft.core.TsSchema

/** Out-of-process generator adapter — the engine-side seam for the real DL
  * providers the reference wraps (TimeGAN via ydata_adapter.py:291-358,
  * DoppleGANger via synthcity_adapter.py:109-155, PAR via
  * sdv_adapter.py:94-119). Those libraries are Python/TensorFlow/Torch and
  * cannot live in the Spark JVM; this provider shells a worker process and
  * speaks a one-line-JSON protocol over stdin/stdout, so ANY runtime that
  * can read a line and print a line can serve models.
  *
  * Protocol (one request line in, one response line out, per invocation):
  * {{{
  *   -> {"op":"fit","schema":{"itemIdCols":[...],"tsCol":"ts",
  *        "numericCols":[...],"catCols":[...]},"data":[{row json},...]}
  *   <- {"ok":true,"model":<opaque json — echoed back verbatim>}
  *   -> {"op":"generate","model":<blob>,"n":2,"seqLen":3,
  *        "columns":["v1","v2"]}
  *   <- {"ok":true,"rows":[{"seq_id":0,"step":0,"v1":1.5,...},...]}
  *   <- {"ok":false,"error":"message"}        // either op, failure path
  * }}}
  *
  * Data plane (`dataPlane`):
  *  - [[ProcessProvider.InlineJson]]: fit() collects the training frame to
  *    the driver as JSON rows inlined in the request — a DELIBERATE driver
  *    boundary, same as the reference adapters' conversion to an in-memory
  *    pandas frame before handing to the model library
  *    (ydata_adapter.py:291-313). Right for small sampled fit sets only.
  *  - [[ProcessProvider.Arrow]]: the EXECUTORS write the fit input as
  *    self-contained Arrow IPC stream files
  *    ([[org.apache.spark.sql.GraftArrowBridge.toIpcFiles]]) and only the
  *    file PATHS travel through the driver and the control channel
  *    (`"data_format":"arrow-ipc-files"`). No full-input driver collect
  *    anywhere in the plan — this is the data plane that survives fit sets
  *    too big to inline. Locally the files land in a temp dir; on a
  *    cluster `arrowDir` must be a shared filesystem visible to both
  *    executors and the worker host.
  *  - [[ProcessProvider.Auto]] (DEFAULT): planner-style choice from the
  *    optimizer's size estimate, never a job (the same pattern as the
  *    Bloom prescreen's small-side fallback in
  *    [[graft.ext.Dedup.bloomPrescreenOverlap]]): inputs estimated at or
  *    under `autoArrowMinBytes` inline as JSON (cheap, zero file-system
  *    coordination), anything larger ships through Arrow. A user who never
  *    reads this scaladoc gets the scale-safe plane by default instead of
  *    an accidental full-input driver collect.
  * The worker is stateless across calls (the fitted model travels inside
  * the messages), so a crash is isolated to one call and the provider
  * itself holds no process handle between calls.
  *
  * @param command argv of the worker, e.g. `Seq("python3", "worker.py")`
  *                (tests use a JVM mock worker and scripts/worker.py)
  * @param autoArrowMinBytes [[ProcessProvider.Auto]] threshold on the
  *                optimizer's size estimate for the fit input; above it the
  *                Arrow plane is selected. Default 1 MB — inline JSON
  *                expands rows ~3-5x as text, so this caps the driver's
  *                request line at a few MB.
  * @param generateArgs extra JSON fields merged into EVERY generate
  *                request — the reference's `generation_arguments` dict
  *                (univariate_metrics.py:141 passes one into its scorer).
  *                E.g. a PAR worker demands a "context" field; passing
  *                `("context" -> JArray(Nil))` here lets context-free
  *                callers (the evaluation pipeline's `generate(n, len)`)
  *                run with the worker's cycled-fitted-contexts default.
  */
final class ProcessProvider(
    command: Seq[String],
    override val name: String = "process",
    timeoutSec: Long = 300,
    dataPlane: ProcessProvider.DataPlane = ProcessProvider.Auto,
    arrowDir: Option[String] = None,
    autoArrowMinBytes: Long = 1L << 20,
    generateArgs: JValue = JObject(Nil)) extends GeneratorProvider {
  require(command.nonEmpty, "worker command must be non-empty")

  /** The Arrow plane is only usable when the executor-written IPC files
    * will be visible to the driver and the worker: always true in local
    * mode (one filesystem), and on a real cluster only when the caller
    * provided a shared `arrowDir`. Letting Auto pick Arrow with a
    * driver-local temp dir on a multi-host master would hand the worker
    * paths that exist on no single machine. */
  private[graft] def arrowViable(master: String): Boolean =
    arrowDir.isDefined || master.startsWith("local")

  private def arrowViable(data: DataFrame): Boolean =
    arrowViable(data.sparkSession.sparkContext.master)

  /** The plane [[fit]] will use for this input — planner-style estimate
    * only, never a job. Exposed within graft so specs can pin the auto
    * decision.
    *
    * NOTE the Auto choice is driven by the OPTIMIZER'S size estimate, not
    * the actual data size: default leaf/join stats can wildly overestimate,
    * so a tiny-but-hard-to-estimate input may ship through Arrow. That is
    * safe (Arrow is the conservative plane) but callers pinning a plane for
    * a known-small input should pass [[ProcessProvider.InlineJson]]
    * explicitly. When Auto would pick Arrow but [[arrowViable]] is false,
    * it falls back to inline JSON rather than producing invisible paths. */
  private[graft] def useArrowFor(data: DataFrame): Boolean =
    dataPlane match {
      case ProcessProvider.Arrow =>
        if (!arrowViable(data))
          fail("Arrow data plane selected but arrowDir is unset and the " +
            "master is not local — executor-written IPC files would not be " +
            "visible to the worker. Pass arrowDir pointing at a shared " +
            "filesystem, or use InlineJson for small fit sets.")
        true
      case ProcessProvider.InlineJson => false
      case ProcessProvider.Auto =>
        data.queryExecution.optimizedPlan.stats.sizeInBytes > autoArrowMinBytes &&
          arrowViable(data)
    }

  /** S4/S5 scan side: the persisted blob is the worker's opaque model JSON
    * ([[ProcessFitted.modelJson]]) verbatim — parse and re-wrap. The worker
    * command is NOT persisted (executing a command read from a model
    * directory would be an injection hazard); the caller re-registers the
    * provider and the blob plugs back in. */
  override def rehydrate(modelBlob: String): Option[FittedGenerator] =
    Some(new ProcessFitted(parse(modelBlob)))

  def fit(data: DataFrame, schema: TsSchema): FittedGenerator = {
    val schemaJson: JValue =
      ("itemIdCols" -> schema.itemIdCols) ~ ("tsCol" -> schema.tsCol) ~
      ("numericCols" -> schema.numericCols) ~ ("catCols" -> schema.catCols)
    val req: JValue =
      if (useArrowFor(data)) {
        import org.apache.spark.sql.GraftArrowBridge
        val dir = arrowDir.getOrElse(
          java.nio.file.Files.createTempDirectory("graft-fit-arrow").toString)
        // rows leave executors as columnar IPC files; the driver only ever
        // holds their paths
        val files = GraftArrowBridge.toIpcFiles(data, dir)
        ("op" -> "fit") ~ ("schema" -> schemaJson) ~
          ("data_format" -> "arrow-ipc-files") ~ ("data_files" -> files)
      } else {
        // driver boundary by design (see scaladoc); toJSON keeps types
        // textual and engine-neutral for the worker
        val rows: Seq[JValue] = data.toJSON.collect().toSeq.map(parse(_))
        ("op" -> "fit") ~ ("schema" -> schemaJson) ~ ("data" -> rows)
      }
    val resp = call(req)
    val model = resp \ "model" match {
      case JNothing => fail("fit response has no 'model' field")
      case m => m
    }
    new ProcessFitted(model)
  }

  /** Fitted handle: the worker's opaque model blob, echoed back on every
    * generate call. Exposed for the model store (S4/S5) — the blob IS the
    * persistable state. */
  final class ProcessFitted(val modelJson: JValue) extends FittedGenerator {
    // generateArgs merge on the LEFT: the per-call fields (op, model, n,
    // seqLen, an explicit context) always win over the provider-level
    // defaults — args supply what the call does not
    def generate(spark: SparkSession, n: Int, seqLen: Int): DataFrame =
      generateReq(spark,
        generateArgs merge (("op" -> "generate") ~ ("model" -> modelJson) ~
          ("n" -> n) ~ ("seqLen" -> seqLen)))

    /** Conditional generation — one sequence per `context` row (the
      * reference's `generate(context_dataframe)`, sdv_adapter.py:125-130).
      * The context frame is per-SEQUENCE (API-bounded, n rows), so the
      * driver-side collect here is the same bounded class as the
      * reference's pandas context frame, never corpus data. The explicit
      * context overrides any `generateArgs` context default. */
    def generateWithContext(
        spark: SparkSession, context: DataFrame, seqLen: Int): DataFrame = {
      val ctxRows: Seq[JValue] =
        context.toJSON.collect().toSeq.map(parse(_))
      // json4s `merge` CONCATENATES JArrays, so a non-empty "context"
      // default in generateArgs would be appended to the explicit rows and
      // the worker would generate for both while `n` counts only ctxRows.
      // Strip the TOP-LEVEL default so the per-call context is the only
      // one sent (removeField recurses — it would also delete a nested
      // worker option that happens to be named "context").
      val baseArgs = generateArgs match {
        case JObject(fields) => JObject(fields.filterNot(_._1 == "context"))
        case other => other
      }
      generateReq(spark,
        baseArgs merge (("op" -> "generate") ~ ("model" -> modelJson) ~
          ("n" -> ctxRows.size) ~ ("seqLen" -> seqLen) ~
          ("context" -> ctxRows)))
    }

    private def generateReq(spark: SparkSession, req: JValue): DataFrame = {
      val resp = call(req)
      val rows = resp \ "rows" match {
        case JArray(rs) => rs
        case _ => fail("generate response has no 'rows' array")
      }
      import spark.implicits._
      // one JSON line per row -> canonical long-frame column order
      val df = spark.read.json(
        spark.createDataset(rows.map(r => compact(render(r)))))
      val dataCols = df.columns.filterNot(Set("seq_id", "step")).sorted
      df.select((Seq("seq_id", "step") ++ dataCols).map(org.apache.spark.sql.functions.col): _*)
    }
  }

  private def fail(msg: String): Nothing =
    throw new IllegalStateException(s"ProcessProvider($name): $msg")

  /** One request/response round-trip with a fresh worker process. */
  private def call(req: JValue): JValue = {
    val pb = new ProcessBuilder(command: _*)
    // stderr goes to a file, not a pipe: a worker logging heavily to an
    // undrained stderr pipe would block mid-write and deadlock the call
    val errFile = java.io.File.createTempFile("graft-worker-err", ".log")
    errFile.deleteOnExit()
    pb.redirectError(errFile)
    val proc = pb.start()
    try {
      val out = new OutputStreamWriter(proc.getOutputStream, StandardCharsets.UTF_8)
      out.write(compact(render(req)))
      out.write("\n")
      out.flush()
      out.close()
      // deadline-bounded read: a plain readLine() would block forever on a
      // hung worker and the timeout below it would be dead code; and a
      // worker that answered but lingers must NOT fail the call (the
      // finally destroys it)
      val line = readLineWithDeadline(
        proc, System.nanoTime() + timeoutSec * 1000000000L)
      if (line == null) {
        val alive = proc.isAlive
        val err = readErr(errFile)
        if (alive) fail(s"worker timed out after ${timeoutSec}s: $err")
        else fail(s"worker produced no output (exit ${proc.exitValue()}): $err")
      }
      val resp = parse(line)
      resp \ "ok" match {
        case JBool(true) => resp
        case JBool(false) =>
          // worker-reported failure — surfaced with the worker's message,
          // mirroring the reference registry's error path (adapter.py:95-97)
          val msg = resp \ "error" match {
            case JString(e) => e
            case _ => "unknown worker error"
          }
          fail(s"worker error: $msg")
        case _ => fail(s"malformed worker response: $line")
      }
    } finally {
      proc.destroyForcibly()
      errFile.delete()
      ()
    }
  }

  /** Read one UTF-8 line from the worker's stdout without ever blocking
    * past `deadlineNanos`: poll `available()`, sleep briefly when idle,
    * stop at '\n' / EOF / a dead silent worker / the deadline (null). */
  private def readLineWithDeadline(proc: Process, deadlineNanos: Long): String = {
    val in = proc.getInputStream
    val buf = new java.io.ByteArrayOutputStream()
    while (System.nanoTime() < deadlineNanos) {
      if (in.available() > 0) {
        val chunk = new Array[Byte](math.min(in.available(), 1 << 16))
        val n = in.read(chunk)
        if (n < 0) return new String(buf.toByteArray, StandardCharsets.UTF_8)
        val nl = chunk.indexOf('\n'.toByte)
        if (nl >= 0 && nl < n) {
          buf.write(chunk, 0, nl)
          return new String(buf.toByteArray, StandardCharsets.UTF_8)
        }
        buf.write(chunk, 0, n)
      } else if (!proc.isAlive) {
        // drain anything flushed between the liveness check and exit
        if (in.available() == 0) {
          return if (buf.size() == 0) null
          else new String(buf.toByteArray, StandardCharsets.UTF_8)
        }
      } else {
        Thread.sleep(5L)
      }
    }
    null // deadline passed mid-line or before any output
  }

  private def readErr(f: java.io.File): String =
    try {
      val lines = java.nio.file.Files.readAllLines(f.toPath)
      import scala.jdk.CollectionConverters._
      lines.asScala.take(20).mkString(" | ")
    } catch { case _: Throwable => "" }
}

object ProcessProvider {
  /** Fit-input data plane — see the class scaladoc for the semantics of
    * each mode. */
  sealed trait DataPlane
  /** Planner-style selection: inline JSON at or under the size-estimate
    * threshold, Arrow IPC files above it. The default. */
  case object Auto extends DataPlane
  /** Always ship fit input as executor-written Arrow IPC files. */
  case object Arrow extends DataPlane
  /** Always inline fit rows as JSON in the request (driver collect). */
  case object InlineJson extends DataPlane
}
