package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Parquet table loader with timestamp normalization (SURVEY §2.1 S1/S2).
  *
  * Spark's TimestampType is microsecond-precision and refuses parquet
  * TIMESTAMP(NANOS) columns; with `spark.sql.legacy.parquet.nanosAsLong=true`
  * they surface as LongType nanos. `load` converts any such column back to a
  * proper timestamp by integer-truncating to micros — byte-identical to how
  * DuckDB (the oracle) coerces ns → µs.
  */
object Tables {

  /** Columns that are nanosecond epochs when `nanosAsLong` kicks in. */
  private val NanoTsCols = Set("ts")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.foldLeft(df) { (d, f) =>
      if (NanoTsCols.contains(f.name) && f.dataType == LongType)
        d.withColumn(f.name, expr(s"timestamp_micros(${f.name} div 1000)"))
      else d
    }
  }
}
