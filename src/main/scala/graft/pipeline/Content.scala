package graft.pipeline

import graft.model.DocumentRepresentation

/** Content resolution — the Spark replacement for the reference's
  * string-keyed capability registry serving `originalContentIn` /
  * `simpleTextIn` (reference: pipeline/capabilities/DefaultCapabilityRegistry.kt:6-37,
  * participants/file/fileIo.kt:12-71).
  *
  * The registry's semantics were "execute all providers, take the first
  * non-null" — here that is an explicit ordered list of resolvers
  * (`FirstMatchResolver`), constructor-injected into enrichers instead of
  * located by string at runtime; registration order remains semantically
  * load-bearing, exactly like the reference (SURVEY.md §2 C3).
  */
trait ContentResolver extends Serializable {
  def resolve(r: DocumentRepresentation): Option[String]
}

/** Inline content: the representation's `path` field carries the payload
  * itself (`createdBy == "inline"`). The testdata documents have no
  * backing files, so ingestion embeds text inline — the columnar
  * equivalent of the reference's "keep representation off Kafka" pointer,
  * with the store collapsed into the pointer. */
object InlineContentResolver extends ContentResolver {
  override def resolve(r: DocumentRepresentation): Option[String] =
    if (r != null && r.createdBy == "inline") Option(r.path) else None
}

/** Real-file content (the reference's FileOriginalContentCapability,
  * fileIo.kt:12-20). */
object FileContentResolver extends ContentResolver {
  override def resolve(r: DocumentRepresentation): Option[String] = {
    if (r == null || r.path == null) return None
    val p = java.nio.file.Paths.get(r.path)
    if (java.nio.file.Files.isReadable(p))
      Some(new String(java.nio.file.Files.readAllBytes(p), java.nio.charset.StandardCharsets.UTF_8))
    else None
  }
}

/** Ordered first-match over providers (C3 semantics). */
class FirstMatchResolver(providers: Seq[ContentResolver]) extends ContentResolver {
  override def resolve(r: DocumentRepresentation): Option[String] =
    providers.view.flatMap(_.resolve(r)).headOption
}

object ContentResolver {
  val default: ContentResolver =
    new FirstMatchResolver(Seq(InlineContentResolver, FileContentResolver))
}
