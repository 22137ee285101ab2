package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{DateFormats, TimeSeriesFrame, TsSchema}

class TimeSeriesFrameSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("strftime -> JDK pattern translation (F1/F2, SURVEY trap 7)") {
    assert(DateFormats.strftimeToJdk("%d/%m/%Y") == "dd/MM/yyyy")
    assert(DateFormats.strftimeToJdk("%Y-%m-%d %H:%M:%S.%f")
      == "yyyy-MM-dd HH:mm:ss.SSSSSS")
    assert(DateFormats.strftimeToJdk("%Y%%") == "yyyy%")
    // %%-adjacent letters must come out as QUOTED literals, not live
    // JDK pattern characters
    assert(DateFormats.strftimeToJdk("%%Y") == "'%Y'")
    assert(DateFormats.strftimeToJdk("%Y at %H") == "yyyy' at 'HH")
    intercept[IllegalArgumentException](DateFormats.strftimeToJdk("%Q"))
    intercept[IllegalArgumentException](DateFormats.strftimeToJdk("abc%"))
  }

  test("wrapper: parse with the reference default format, resample, normalise") {
    val schema = TsSchema(Seq("id"), "ts", Seq("v")) // dateFormat %d/%m/%Y
    val tsf = TimeSeriesFrame(
      Seq(("a", "01/02/2024", 1.0, 0L), ("a", "01/02/2024", 2.0, 1L),
        ("b", "03/02/2024", 5.0, 2L))
        .toDF("id", "ts", "v", "ord"),
      schema).parseTimestamps()
    assert(tsf.df.schema("ts").dataType.typeName == "timestamp")
    val daily = tsf.resampleSum()
    assert(daily.df.count() == 2) // one bucket per entity
    val norm = tsf.normalise("ord")
    assert(norm.numSequences == 2 && norm.seqLen == 3) // Feb 1..3 calendar
    val back = tsf.formatTimestamps()
    assert(back.df.select("ts").as[String].collect().head == "01/02/2024")
  }

  test("wrapper: windows + scaler round-trip") {
    val schema = TsSchema(Seq("id"), "ts", Seq("v"))
    val tsf = TimeSeriesFrame(
      (0 until 10).map(i => ("a", i.toLong, i.toDouble)).toDF("id", "ts", "v"),
      schema)
    assert(tsf.slidingWindows(4, "ts").count() == 7)
    val stats = tsf.fitScaler()
    val scaled = stats.transform(tsf.df).agg(max("v")).head().getDouble(0)
    assert(scaled == 1.0)
  }
}
