package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TimeMode, TimerValues}

/** Custom keyed state over streams (SURVEY §2.9 extension surface):
  * `flatMapGroupsWithState` for semantics the declarative window
  * aggregates can't express — here, a per-entity running aggregate that
  * emits a delta row per micro-batch.
  */
object StatefulOps {

  final case class Obs(itemId: String, value: Double)
  final case class RunningState(n: Long, total: Double)
  final case class RunningOut(itemId: String, n: Long, total: Double, mean: Double)

  implicit private val stateEnc: Encoder[RunningState] = Encoders.product[RunningState]
  implicit private val outEnc: Encoder[RunningOut] = Encoders.product[RunningOut]

  /** One step of the running aggregate — the shared semantics of BOTH
    * state APIs below (fold the batch, emit a delta row only when the
    * count moved). */
  private def step(
      key: String,
      prev: RunningState,
      rows: Iterator[Obs]): (RunningState, Iterator[RunningOut]) = {
    var n = prev.n
    var total = prev.total
    rows.foreach { o => n += 1; total += o.value }
    val out =
      if (n == prev.n) Iterator.empty
      else Iterator.single(RunningOut(key, n, total, total / n))
    (RunningState(n, total), out)
  }

  /** Per-entity running count/sum/mean that survives across micro-batches.
    * State is two numbers per key — bounded regardless of stream length;
    * no watermark needed because the state never grows with events.
    */
  def runningMean(ds: Dataset[Obs]): Dataset[RunningOut] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.itemId)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: String, rows: Iterator[Obs], state: GroupState[RunningState]) => {
          val (next, out) = step(
            key, state.getOption.getOrElse(RunningState(0L, 0.0)), rows)
          state.update(next)
          out
        })
  }

  /** The same running aggregate on Spark 4's `transformWithState` API —
    * the successor to `flatMapGroupsWithState`: typed `ValueState` handles
    * instead of a single state object, explicit TimeMode, and RocksDB
    * state-store backing (set
    * `spark.sql.streaming.stateStore.providerClass` to
    * `...RocksDBStateStoreProvider`; transformWithState requires it).
    * State remains two numbers per key — bounded for an unbounded stream.
    */
  class RunningMeanProcessor
      extends StatefulProcessor[String, Obs, RunningOut] {
    @transient private var state:
      org.apache.spark.sql.streaming.ValueState[RunningState] = _

    override def init(
        outputMode: OutputMode,
        timeMode: TimeMode): Unit =
      state = getHandle.getValueState[RunningState](
        "running", Encoders.product[RunningState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(
        key: String,
        rows: Iterator[Obs],
        timerValues: TimerValues): Iterator[RunningOut] = {
      val (next, out) = step(
        key, Option(state.get()).getOrElse(RunningState(0L, 0.0)), rows)
      state.update(next)
      out
    }
  }

  def runningMeanTws(ds: Dataset[Obs]): Dataset[RunningOut] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.itemId)
      .transformWithState(
        new RunningMeanProcessor,
        TimeMode.None(),
        OutputMode.Append())
  }
}
