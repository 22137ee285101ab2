package org.apache.spark.sql

import org.apache.spark.TaskContext
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.execution.arrow.ArrowConverters
import org.apache.spark.sql.types.StructType

/** Bridge to Spark's `private[sql]` Arrow interchange (the machinery under
  * PySpark's `mapInArrow`): serialize a DataFrame's partitions as Arrow IPC
  * record batches and re-enter a DataFrame from such batches. This is the
  * columnar hand-off shape for out-of-process media codecs — an external
  * worker (Python/pyarrow, a native decoder) consumes record batches and
  * returns record batches, with zero per-row serialization on either side.
  * Scala exposes no public equivalent of `mapInArrow`, hence the shim
  * (same pattern as [[GraftColumnBridge]]; classic sessions only).
  */
object GraftArrowBridge {

  /** One serialized Arrow record batch per element (partition-aligned). */
  def toBatchRdd(df: DataFrame): RDD[Array[Byte]] =
    df.asInstanceOf[classic.Dataset[Row]].toArrowBatchRdd

  /** Parse serialized Arrow record batches back into a DataFrame of
    * `schema` (the inverse of [[toBatchRdd]] for an unchanged schema, or
    * the re-entry point for a worker that emitted a new schema). */
  def fromBatchRdd(
      spark: SparkSession,
      batches: RDD[Array[Byte]],
      schema: StructType): DataFrame = {
    val s = spark.asInstanceOf[classic.SparkSession]
    val timeZone = s.sessionState.conf.sessionLocalTimeZone
    val rows = batches.mapPartitions { it =>
      ArrowConverters.fromBatchIterator(
        it, schema, timeZone,
        true,  // errorOnDuplicatedFieldNames
        false, // largeVarTypes
        TaskContext.get())
    }
    s.internalCreateDataFrame(rows, schema)
  }
}
