package graft.pipeline

import org.apache.spark.sql.{Column, Dataset}
import org.apache.spark.sql.functions._
import graft.model._

/** Rendition producers (SURVEY.md §2 B3): derive side renditions (txt from
  * html/original) and feed them back into consolidation as
  * UPSERT_DOCUMENT_REPRESENTATION events — the reference's
  * content-extraction producer loop (reference:
  * participants/implementations.kt:150-187, which shells to Tika and
  * writes .txt/.html side files; offline here, so extraction is a
  * deterministic markup strip).
  *
  * Scale: extraction is a narrow columnar projection over the records
  * table; the event union + re-fold costs one shuffle on the record id —
  * the same partitioning as the first fold, so AQE/exchange reuse applies.
  */
object Renditions {

  /** Markup strip: remove tags, decode the basic entities, collapse the
    * result — enough to recover clean text from tag-wrapped content
    * without an HTML parser dependency. */
  def stripMarkup(html: Column): Column = {
    val untagged = regexp_replace(html, "<[^>]*>", "")
    val amp = regexp_replace(
      regexp_replace(
        regexp_replace(untagged, "&lt;", "<"),
        "&gt;", ">"),
      "&amp;", "&")
    amp
  }

  private val MetaType = "struct<values:map<string,string>,createdBy:string>"

  /** Extract a txt rendition from each record's ORIGINAL representation
    * (assumed inline markup) and emit the upsert events that register it.
    * Feed the result back through Consolidate.batch together with the
    * original events — the reference's producer→pipeline feedback loop. */
  def extractTextEvents(records: Dataset[DataRecord],
      createdBy: String = "extract-txt", timestamp: Long = 2L): Dataset[DataRecordEvent] = {
    val spark = records.sparkSession
    import spark.implicits._
    records.toDF().select(
      lit(Command.UpsertRepresentation).as("command"),
      col("id"),
      lit(timestamp).as("timestamp"),
      lit(0L).as("seq"),
      lit(null).cast("string").as("name"),
      struct(
        stripMarkup(col("representation.path")).as("path"),
        lit(createdBy).as("createdBy")).as("representation"),
      lit(null).cast(MetaType).as("meta"))
      .as[DataRecordEvent]
  }

  /** Canonical html form of extracted text — the deterministic offline
    * stand-in for Tika's xhtml rendition (the reference emits BOTH a .txt
    * and a .html side file per document, implementations.kt:172-179 vs
    * 181-187; this is the html twin of `extractTextEvents`). The original
    * markup is first normalized through the same strip, then re-wrapped in
    * a fixed skeleton, so the html rendition is a pure function of the
    * document text on any input shape. */
  def htmlWrap(text: Column): Column =
    concat(lit("<html><body><p>"), text, lit("</p></body></html>"))

  /** Emit html renditions as upsert events (B3' — the html side of the
    * reference's dual txt/html producer). Same narrow projection shape as
    * the txt extraction; distinct `createdBy` keeps the two renditions
    * separately addressable after the fold (finishState orders
    * additionalRepresentations by createdBy). */
  def extractHtmlEvents(records: Dataset[DataRecord],
      createdBy: String = "extract-html", timestamp: Long = 3L): Dataset[DataRecordEvent] = {
    val spark = records.sparkSession
    import spark.implicits._
    records.toDF().select(
      lit(Command.UpsertRepresentation).as("command"),
      col("id"),
      lit(timestamp).as("timestamp"),
      lit(0L).as("seq"),
      lit(null).cast("string").as("name"),
      struct(
        htmlWrap(stripMarkup(col("representation.path"))).as("path"),
        lit(createdBy).as("createdBy")).as("representation"),
      lit(null).cast(MetaType).as("meta"))
      .as[DataRecordEvent]
  }
}
