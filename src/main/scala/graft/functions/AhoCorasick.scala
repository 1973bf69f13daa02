package graft.functions

/** Aho–Corasick multi-pattern string automaton (Aho & Corasick, CACM 1975)
  * — the blocklist/contamination-span scan kernel. One pass over the text
  * finds ALL occurrences of ALL patterns: O(n + matches) regardless of
  * pattern count, where the per-pattern `contains` loop the built-in
  * expression tree would need is O(n · Σ|p|). At 100 TB with a
  * thousands-entry blocklist that asymptotic gap is the whole game.
  *
  * Reference surface: the capability-gated filter/scan producer family
  * (reference pipeline/src/main/kotlin/participants/implementations.kt —
  * per-document predicate producers); the multi-pattern form is its
  * many-patterns generalization.
  *
  * Built once per expression instance from the (driver-collected,
  * broadcast-serialized) pattern array; goto edges live in per-node
  * HashMaps (the corpus alphabet is small), fail links are the classic
  * BFS construction, and each node precomputes its CLOSED output list
  * (own pattern ids ++ fail-chain outputs) so the scan loop never walks
  * fail links for reporting. */
final class AhoCorasick(patterns: Array[String]) extends Serializable {
  private val trans = scala.collection.mutable.ArrayBuffer(
    new scala.collection.mutable.HashMap[Char, Int])
  private val fail = scala.collection.mutable.ArrayBuffer(0)
  private val ends = scala.collection.mutable.ArrayBuffer[List[Int]](Nil)
  private val lens: Array[Int] = patterns.map(_.length)

  // trie
  {
    var id = 0
    while (id < patterns.length) {
      val p = patterns(id)
      var s = 0
      var i = 0
      while (i < p.length) {
        s = trans(s).getOrElseUpdate(p.charAt(i), {
          trans += new scala.collection.mutable.HashMap[Char, Int]
          fail += 0
          ends += Nil
          trans.size - 1
        })
        i += 1
      }
      ends(s) = id :: ends(s)
      id += 1
    }
  }

  /** node → pattern ids ending here, fail-chain closed. */
  private val out: Array[Array[Int]] = {
    val o = new Array[Array[Int]](trans.size)
    o(0) = ends(0).toArray
    val queue = new java.util.ArrayDeque[Int]()
    trans(0).foreach { case (_, v) =>
      fail(v) = 0
      o(v) = ends(v).toArray
      queue.add(v)
    }
    while (!queue.isEmpty) {
      val u = queue.poll()
      trans(u).foreach { case (c, v) =>
        // v is at depth ≥ 2 here (root children were seeded above), and
        // every goto target from the fail chain is strictly shallower
        // than v, so this can never self-loop
        var f = fail(u)
        while (f != 0 && !trans(f).contains(c)) f = fail(f)
        fail(v) = trans(f).getOrElse(c, 0)
        o(v) = (ends(v) ++ o(fail(v))).toArray
        queue.add(v)
      }
    }
    o
  }

  /** One-pass scan: (total occurrences, distinct patterns hit,
    * Σ over occurrences of endPos·31 + patternLength) — the checksum pins
    * every (position, pattern-length) pair without shipping the match
    * list. endPos is the 1-based index of the match's last character,
    * the same `i + len(p) - 1` the SQL oracle computes. */
  def scanStats(text: String): (Long, Long, Long) = {
    var s = 0
    var hits = 0L
    var checksum = 0L
    val seen = new Array[Boolean](patterns.length)
    var nSeen = 0L
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      while (s != 0 && !trans(s).contains(c)) s = fail(s)
      s = trans(s).getOrElse(c, 0)
      val os = out(s)
      var j = 0
      while (j < os.length) {
        val id = os(j)
        hits += 1
        checksum += (i + 1).toLong * 31 + lens(id)
        if (!seen(id)) { seen(id) = true; nSeen += 1 }
        j += 1
      }
      i += 1
    }
    (hits, nSeen, checksum)
  }
}
