package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-pattern blocklist screening — the curation pass that flags
  * documents containing any of a (potentially large) set of banned
  * phrases/URLs/terms.
  *
  * The scan is an Aho–Corasick automaton: ONE pass over each document
  * regardless of pattern count, vs one regexp/contains pass PER pattern
  * for the naive spelling — at 10^4 blocklist entries that is the
  * difference between a linear scan and re-reading the corpus 10^4
  * times. The automaton is built once on the driver (pattern-set-sized)
  * and broadcast; the corpus pass is a zero-shuffle mapPartitions fold,
  * the established primitive-loop pattern.
  *
  * Match semantics: case-insensitive (inputs lowercased in BOTH engines
  * — the corpus-wide `lower()` cross-engine precedent), counting every
  * START POSITION including overlapping occurrences — the natural
  * automaton semantics, and exactly reproducible in SQL as a
  * substring-position scan (unlike regexp/replace counting, which is
  * non-overlapping and diverges on self-overlapping patterns).
  */
object Blocklist {

  /** Compact serializable Aho–Corasick automaton over lowercase
    * patterns. Node 0 is the root; goto is a per-node char map (pattern
    * sets are sparse), fail links built BFS, and each node carries the
    * ids of every pattern ENDING at it — including through the fail
    * chain, precomputed at build so the scan never walks suffix links. */
  final class Automaton(val patterns: Seq[String]) extends Serializable {
    require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
      "blocklist needs at least one non-empty pattern")
    private val goto_ = scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Char, Int]())
    private val ends = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    // map.get on a miss unboxes null to 0, and node 0 (the root) is never
    // anyone's child — so 0 doubles as the "absent" sentinel throughout
    patterns.zipWithIndex.foreach { case (p, pid) =>
      var node = 0
      p.foreach { ch =>
        val next = goto_(node).get(ch)
        node = if (next == 0) {
          goto_.append(new java.util.HashMap[Char, Int]())
          ends.append(Nil)
          goto_(node).put(ch, goto_.length - 1)
          goto_.length - 1
        } else next
      }
      ends(node) = pid :: ends(node)
    }
    private val fail = new Array[Int](goto_.length)
    private val emit: Array[Array[Int]] = {
      val queue = new java.util.ArrayDeque[Int]()
      val rootIt = goto_(0).entrySet().iterator()
      while (rootIt.hasNext) {
        val child = rootIt.next().getValue.intValue()
        fail(child) = 0; queue.add(child)
      }
      val order = scala.collection.mutable.ArrayBuffer.empty[Int]
      while (!queue.isEmpty) {
        val node = queue.poll()
        order += node
        val it = goto_(node).entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val ch = e.getKey.charValue()
          val child = e.getValue.intValue()
          var f = fail(node)
          while (f != 0 && !goto_(f).containsKey(ch)) f = fail(f)
          val t = goto_(f).get(ch)
          fail(child) = if (t != child) t else 0
          queue.add(child)
        }
      }
      val e = Array.fill(goto_.length)(List.empty[Int])
      e(0) = ends(0)
      order.foreach(n => e(n) = ends(n) ::: e(fail(n))) // BFS: fail(n) done
      e.map(_.toArray)
    }

    /** Per-pattern occurrence counts (every start position) in `text`. */
    def countMatches(text: String): Array[Long] = {
      val hits = new Array[Long](patterns.length)
      var node = 0
      var i = 0
      while (i < text.length) {
        val ch = text.charAt(i)
        while (node != 0 && !goto_(node).containsKey(ch)) node = fail(node)
        node = goto_(node).get(ch) // 0 on miss at root: stay at root
        val es = emit(node)
        var j = 0
        while (j < es.length) { hits(es(j)) += 1L; j += 1 }
        i += 1
      }
      hits
    }
  }

  /** Per-document screen: total hit count, number of distinct patterns
    * present, and the block verdict. Zero shuffles. */
  def screen(docs: DataFrame, patterns: Seq[String]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(
      new Automaton(patterns.map(_.toLowerCase)))
    docs.select(col("doc_id"), lower(col("text")).as("t"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val ac = bc.value
        it.map { case (id, t) =>
          // NULL text scores all-zero (not dropped): every doc gets a
          // verdict, matching the oracle's CASE ... ELSE 0 on NULL length
          if (t == null) (id, 0L, 0L, false)
          else {
            val hits = ac.countMatches(t)
            var tot = 0L; var distinct = 0L
            hits.foreach { h => tot += h; if (h > 0L) distinct += 1L }
            (id, tot, distinct, tot > 0L)
          }
        }
      }.toDF("doc_id", "n_hits", "n_patterns_hit", "blocked")
  }
}
