package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Task-parameter model + optional-predicate filter builder
  * (reference: util/ParamUtils.java:42-49 — JSON task_param whose
  * values are single-element arrays; util/ValidUtils.java:19-104 —
  * between / in / equal predicates where an ABSENT parameter means
  * pass-all; applied in the big session filter at
  * UserVisitSessionAnalyzeSpark.java:505-669).
  *
  * Spark-first: each optional param contributes one Column predicate;
  * `None` contributes nothing. The conjunction is pushed into the
  * scan by Catalyst, so an absent filter costs nothing — unlike the
  * reference, which string-parses every concat-record per row.
  */
case class TaskParams(
    startDate: Option[String] = None,
    endDate: Option[String] = None,
    minValue: Option[Double] = None,     // reference: startAge
    maxValue: Option[Double] = None,     // reference: endAge
    categories: Option[Seq[String]] = None, // reference: professionals/cities (CSV in)
    kind: Option[String] = None,         // reference: sex (equal)
    keywords: Option[Seq[String]] = None) // reference: keywords (ANY-match)

object TaskParams {

  /** Build the conjunction of present predicates; pass-all if none. */
  def predicate(p: TaskParams,
                dateCol: Column, valueCol: Column,
                categoryCol: Column, kindCol: Column,
                textCol: Column): Column = {
    val preds = Seq(
      p.startDate.map(d => dateCol >= d),
      p.endDate.map(d => dateCol <= d),
      p.minValue.map(v => valueCol >= v),  // ValidUtils.between
      p.maxValue.map(v => valueCol <= v),
      p.categories.map(cs => categoryCol.isin(cs: _*)),      // ValidUtils.in
      p.kind.map(k => kindCol === k),                        // ValidUtils.equal
      p.keywords.map(ks =>                                   // ANY keyword hit
        ks.map(k => textCol.contains(k)).reduce(_ || _))
    ).flatten
    preds.reduceOption(_ && _).getOrElse(lit(true))
  }

  /** Parse the reference's JSON convention: every value is a
    * single-element JSON array (`{"startDate":["2019-01-01"], ...}`).
    * Pure-JVM (driver-side control metadata, like the reference's
    * MySQL task row — not data-plane). */
  def fromJson(json: String): TaskParams = {
    def field(k: String): Option[String] = {
      val m = (s""""$k"\\s*:\\s*\\[\\s*"((?:[^"\\\\]|\\\\.)*)"""").r
      m.findFirstMatchIn(json).map(_.group(1))
    }
    TaskParams(
      startDate = field("startDate"),
      endDate = field("endDate"),
      minValue = field("minValue").map(_.toDouble),
      maxValue = field("maxValue").map(_.toDouble),
      categories = field("categories").map(_.split(",").toSeq),
      kind = field("kind"),
      keywords = field("keywords").map(_.split(",").toSeq))
  }
}
