package graft

import org.apache.spark.sql.functions._
import graft.ops.Ner

/** Corpus-trained entity typing (B7 upgrade): vote training, gazetteer
  * argmax, and context-vote tagging on hand-computed fixtures. */
class NerSpec extends SparkSpec {
  import spark.implicits._

  // labeled catalog: "red" is 2-1 COLOR over MAT, "ring" pure OBJ,
  // "steel" pure MAT — tokens genuinely ambiguous across categories
  private lazy val labeled = Seq(
    ("red ring", "COLOR"), ("red gear", "COLOR"), ("red steel", "MAT"),
    ("steel ring", "OBJ"), ("steel gear", "MAT")
  ).toDF("name", "cat")

  test("tokenVotes counts (token, type) occurrences exactly") {
    val v = Ner.tokenVotes(labeled, "name", "cat")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(v(("red", "COLOR")) === 2L)
    assert(v(("red", "MAT")) === 1L)
    assert(v(("steel", "MAT")) === 2L)
    assert(v(("steel", "OBJ")) === 1L)
    assert(v(("ring", "COLOR")) === 1L)
    assert(v(("ring", "OBJ")) === 1L)
  }

  test("gazetteer picks the majority type, ties to the lexicographically first") {
    val g = Ner.gazetteer(Ner.tokenVotes(labeled, "name", "cat"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(g("red") === "COLOR")   // 2 > 1
    assert(g("steel") === "MAT")   // 2 > 1
    assert(g("ring") === "COLOR")  // 1 = 1 tie → COLOR < OBJ
    assert(g("gear") === "COLOR")  // 1 = 1 tie → COLOR < MAT
  }

  test("tag scores own + whole-text context votes, unknown tokens emit nothing") {
    val votes = Ner.tokenVotes(labeled, "name", "cat")
    val docs = Seq((1L, "red steel unknown")).toDF("id", "text")
    val out = Ner.tag(docs, "id", "text", votes)
      .collect().map(r => (r.getInt(1), r.getString(2), r.getString(3), r.getLong(4)))
    // ctx: COLOR 2 (red), MAT 1+2=3 (red+steel), OBJ 1 (steel)
    // pos 0 "red":  COLOR 2+2=4, MAT 1+3=4, OBJ 0+1=1 → tie → COLOR
    // pos 1 "steel": MAT 2+3=5, COLOR 0+2=2, OBJ 1+1=2 → MAT
    // pos 2 "unknown": no row
    assert(out.toSet === Set((0, "red", "COLOR", 4L), (1, "steel", "MAT", 5L)))
  }

  test("EntityEnricher.trained overrides pattern rules with learned types") {
    import graft.pipeline.StandardEnrichers.EntityEnricher
    import graft.model._
    val gaz = Ner.gazetteer(Ner.tokenVotes(labeled, "name", "cat"))
    val e = EntityEnricher.trained(gaz)
    val rec = DataRecord(7L, "d", 1L,
      DocumentRepresentation("steel bolt42 17 red", "inline"), Seq.empty, Seq.empty)
    val vals = e.values(rec)
    assert(vals("steel") === "MAT")    // learned
    assert(vals("red") === "COLOR")    // learned
    assert(vals("bolt42") === "IDENT") // pattern floor still on
    assert(vals("17") === "NUMBER")
    assert(!vals.contains("bolt"))     // unknown, no pattern → absent
  }
}
