package graft.model

/** Domain model (SURVEY.md §1.1), re-expressed as Spark-encodable case
  * classes. Differences from the reference are deliberate Spark-first
  * choices:
  *   - identity is `xxhash64(path)` (stable 64-bit), not JVM
  *     `String.hashCode.toLong` (32-bit-collision-prone) —
  *     reference: pipeline/impl/KafkaIntelligencePipeline.kt:314;
  *   - Kotlin `Set<...>` becomes `Seq[...]` with set semantics enforced by
  *     the fold (Spark has no SetType) —
  *     reference: model/src/main/kotlin/datatypes/datarecords.kt:38-44;
  *   - the event union is one flat case class with a command discriminator
  *     (sealed-trait encoders don't exist in Spark SQL) —
  *     reference: datarecords.kt:16-19, 49-52.
  */

/** A rendition of the document (original, extracted txt/html, ...).
  * reference: datarecords.kt:31-33 */
case class DocumentRepresentation(path: String, createdBy: String)

/** One producer's key/value annotations. reference: datarecords.kt:25-26 */
case class Metadata(values: Map[String, String], createdBy: String)

/** The consolidated domain object. reference: datarecords.kt:38-44 */
case class DataRecord(
    id: Long,
    name: String,
    timestamp: Long,
    representation: DocumentRepresentation,
    additionalRepresentations: Seq[DocumentRepresentation],
    meta: Seq[Metadata]) {

  def metaBy(createdBy: String): Option[Metadata] =
    meta.find(_.createdBy == createdBy)
}

object DataRecord {
  val empty: DataRecord =
    DataRecord(0L, null, 0L, null, Seq.empty, Seq.empty)
}

/** Sub-document unit. reference: datarecords.kt:6-12. `chunkType` ∈
  * ChunkType; `index` is the ordinal within the parent; `parentId` is the
  * DataRecord key. */
case class Chunk(
    chunkType: String,
    index: Long,
    parentId: Long,
    content: String,
    createdBy: String)

object ChunkType {
  val General = "GENERAL"; val Page = "PAGE"; val Paragraph = "PARAGRAPH"
  val Sentence = "SENTENCE"; val Word = "WORD"
}

/** Change event; exactly one payload field is set per command.
  * reference: datarecords.kt:49-52. `seq` disambiguates events with equal
  * timestamps so batch folds are deterministic (Kafka gave per-key log
  * order for free; a distributed batch engine must carry the order in the
  * data — SURVEY.md §7.4). */
case class DataRecordEvent(
    command: String,
    id: Long,
    timestamp: Long,
    seq: Long,
    name: Option[String],
    representation: Option[DocumentRepresentation],
    meta: Option[Metadata])

object Command {
  val Create = "CREATE"
  val UpsertMetadata = "UPSERT_METADATA"
  val UpsertRepresentation = "UPSERT_DOCUMENT_REPRESENTATION"
}

object DataRecordEvent {
  def create(id: Long, name: String, repr: DocumentRepresentation,
      timestamp: Long, seq: Long = 0L): DataRecordEvent =
    DataRecordEvent(Command.Create, id, timestamp, seq, Some(name), Some(repr), None)

  def upsertMeta(id: Long, m: Metadata, timestamp: Long, seq: Long = 0L): DataRecordEvent =
    DataRecordEvent(Command.UpsertMetadata, id, timestamp, seq, None, None, Some(m))

  def upsertRepresentation(id: Long, r: DocumentRepresentation,
      timestamp: Long, seq: Long = 0L): DataRecordEvent =
    DataRecordEvent(Command.UpsertRepresentation, id, timestamp, seq, None, Some(r), None)
}

/** Uncertain fact with confidence — reference: model/src/main/kotlin/facts/facts.kt:6-36.
  * `proposal` is kept String-typed (the generic `Proposition<U>` doesn't
  * survive Spark encoders; producers stringify). */
case class Proposition(subject: String, proposal: String, confidence: Double, proposer: String)
case class PropositionScore(proposal: String, score: Double)
