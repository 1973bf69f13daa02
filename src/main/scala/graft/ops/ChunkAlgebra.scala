package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.model.{Chunk, ChunkType}

/** Chunk sequence algebra (SURVEY.md §2 D): the reference's pure
  * `Sequence<T>` editing ops mirroring ChunkCommand —
  * reference: pipeline/src/main/kotlin/chunks/sequence_management.kt:5-27,
  * tested by unittests/SequenceTests.kt:8-41.
  *
  * Two forms:
  *   - column form over an ordered ArrayType column (slice/concat —
  *     codegen-friendly, for use inside DataFrame plans);
  *   - Scala form over Seq[T] (for the typed fold of a chunk-command log
  *     inside mapGroups / Aggregators).
  *
  * Indices are 0-based like the reference's. Out-of-bounds `update` is a
  * no-op (sequence_management.kt:14-17); `merge` collapses [from,to] into
  * one combined element (:19-22).
  */
object ChunkAlgebra {

  // ------------------------------------------------------------ Seq form

  def append[T](xs: Seq[T], x: T): Seq[T] = xs :+ x

  def insertAt[T](xs: Seq[T], i: Int, x: T): Seq[T] =
    if (i < 0 || i > xs.length) xs
    else (xs.take(i) :+ x) ++ xs.drop(i)

  def updateAt[T](xs: Seq[T], i: Int, x: T): Seq[T] =
    if (i < 0 || i >= xs.length) xs else xs.updated(i, x)

  def mergeRange[T](xs: Seq[T], from: Int, to: Int, combine: Seq[T] => T): Seq[T] =
    if (from < 0 || to >= xs.length || from > to) xs
    else (xs.take(from) :+ combine(xs.slice(from, to + 1))) ++ xs.drop(to + 1)

  def removeAt[T](xs: Seq[T], i: Int): Seq[T] =
    if (i < 0 || i >= xs.length) xs
    else xs.take(i) ++ xs.drop(i + 1)

  // --------------------------------------------------------- column form

  /** 0-based insert into an array column (out-of-range appends at the
    * clamped position, mirroring Seq-form semantics for valid i). */
  def insertAtCol(arr: Column, i: Int, x: Column): Column =
    concat(slice(arr, 1, i), array(x), slice(arr, lit(i + 1), size(arr)))

  def updateAtCol(arr: Column, i: Int, x: Column): Column =
    when(size(arr) > i,
      concat(slice(arr, 1, i), array(x), slice(arr, lit(i + 2), size(arr))))
      .otherwise(arr)

  def removeAtCol(arr: Column, i: Int): Column =
    when(size(arr) > i,
      concat(slice(arr, 1, i), slice(arr, lit(i + 2), size(arr))))
      .otherwise(arr)

  /** Merge [from,to] (0-based, inclusive) of a string array into one
    * space-joined element. */
  def mergeRangeCol(arr: Column, from: Int, to: Int): Column =
    when(size(arr) > to && lit(from) <= lit(to),
      concat(slice(arr, 1, from),
        array(concat_ws(" ", slice(arr, from + 1, to - from + 1))),
        slice(arr, lit(to + 2), size(arr))))
      .otherwise(arr)

  // ----------------------------------------------------------- chunkers

  /** Word chunker: text → WORD chunks with ordinal + parent FK (the
    * reference's ChunkProducer shape, KafkaIntelligencePipeline.kt:142-145,
    * with the START/LAST framing carried by `index` boundaries). */
  def wordChunks(parentId: Long, text: String, createdBy: String): Seq[Chunk] = {
    val words = text.split(" ", -1).toSeq
    words.zipWithIndex.map { case (w, i) =>
      Chunk(ChunkType.Word, i.toLong, parentId, w, createdBy)
    }
  }

  /** Fixed-width word-window chunker (paragraph analog). */
  def windowChunks(parentId: Long, text: String, width: Int, createdBy: String): Seq[Chunk] = {
    val words = text.split(" ", -1).toSeq
    words.grouped(width).zipWithIndex.map { case (ws, i) =>
      Chunk(ChunkType.Paragraph, i.toLong, parentId, ws.mkString(" "), createdBy)
    }.toSeq
  }
}
