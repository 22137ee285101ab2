package graft

import org.json4s._
import org.json4s.JsonDSL._
import org.json4s.jackson.JsonMethods._

/** JSON-over-stdio mock model worker for [[graft.providers.ProcessProvider]]
  * tests — plays the role the reference's mocked Python model layers play in
  * its adapter tests (tests/test_ydata_adapter.py:13-45): a deterministic
  * stand-in behind the real process seam.
  *
  * fit: model = per-numeric-column mean of the training rows.
  * generate: value(c) = mean(c) + step · 0.25 (bit-deterministic).
  * With argv "fail": always responds `{"ok":false,"error":"boom"}` to
  * exercise the error path.
  */
object MockWorker {
  def main(args: Array[String]): Unit = {
    val line = scala.io.StdIn.readLine()
    if (args.contains("fail")) {
      println(compact(render(("ok" -> false) ~ ("error" -> "boom"))))
      return
    }
    val req = parse(line)
    val out: JValue = req \ "op" match {
      case JString("fit") =>
        val JArray(numCols) = req \ "schema" \ "numericCols"
        val JArray(rows) = req \ "data"
        val means: List[(String, Double)] = numCols.map { case JString(c) =>
          val vs = rows.map(r => r \ c).collect {
            case JDouble(d) => d
            case JInt(i) => i.toDouble
            case JLong(l) => l.toDouble
            case JDecimal(d) => d.toDouble
          }
          c -> (if (vs.isEmpty) 0.0 else vs.sum / vs.size)
        }.collect { case (c: String, m: Double) => c -> m }
        ("ok" -> true) ~ ("model" -> JObject(
          "means" -> JObject(means.map { case (c, m) => c -> JDouble(m) })))
      case JString("generate") =>
        val JObject(meanFields) = req \ "model" \ "means"
        val JInt(n) = req \ "n"
        val JInt(seqLen) = req \ "seqLen"
        val rows = for {
          s <- 0 until n.toInt
          t <- 0 until seqLen.toInt
        } yield JObject(
          List("seq_id" -> JInt(s), "step" -> JInt(t)) ++
            meanFields.map { case JField(c, JDouble(m)) =>
              c -> JDouble(m + t * 0.25)
            })
        ("ok" -> true) ~ ("rows" -> JArray(rows.toList))
      case other =>
        ("ok" -> false) ~ ("error" -> s"unknown op $other")
    }
    println(compact(render(out)))
  }
}
