package graft

import org.json4s.{DefaultFormats, Formats, JObject}
import org.json4s.jackson.JsonMethods

/** Committed per-query bench floors (`BASELINE_QUERIES.json`, the
  * cross-run-min map the adjudication protocol keys on — BASELINE.md).
  * One real JSON parse shared by Bench's burst guard and DriftSpec's
  * every-key-has-a-floor gate, replacing the r9 regex parse that was
  * only correct while the file stayed flat (VERDICT r9 item 9).
  */
object Floors {
  implicit private val fmts: Formats = DefaultFormats

  /** name -> floor seconds; empty map if the file is missing/unreadable
    * (Bench must still run on a fresh checkout without floors).
    */
  def load(path: String = "BASELINE_QUERIES.json"): Map[String, Double] =
    try {
      val txt = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(path)), "UTF-8")
      (JsonMethods.parse(txt) \ "floor_sec") match {
        case JObject(fields) => fields.toMap.flatMap { case (k, v) =>
          v.extractOpt[Double].map(k -> _)
        }
        case _ => Map.empty
      }
    } catch { case scala.util.control.NonFatal(_) => Map.empty }
}
