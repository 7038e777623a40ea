package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterated BPE TRAINER (Sennrich et al., ACL'16 — the loop the
  * registry previously only bracketed: q79 computes ONE round's pair
  * counts, q155 APPLIES a pinned merge table; this produces the table).
  * Each round over the (word, count) vocabulary: count all adjacent
  * symbol pairs weighted by word count, take the argmax under the total
  * (count DESC, left ASC, right ASC) order, merge it exhaustively in
  * every word's segmentation, repeat.
  *
  * Scale shape — the q79 two-stage posture end to end: corpus-scale
  * work is ONLY the one (word, count) aggregate the caller passes in
  * (map-side combined; a word appearing a billion times trains once).
  * Every round is vocabulary-scale: one narrow (l, r, cnt) shuffle for
  * the pair counts, a ONE-ROW bounded collect for the argmax (the
  * driver never sees the vocabulary), and a codegen'd replace chain for
  * the rewrite, checkpointed per round so plans stay shallow. Total:
  * O(rounds) vocab passes, O(rounds) rows on the driver.
  *
  * Determinism: counts are exact integers and the (cnt, l, r) order is
  * total, so the learned table is engine-replayable — q156's DuckDB
  * oracle replays the identical loop as `rounds` unrolled CTE blocks
  * (argmax via ORDER BY cnt DESC, l, r LIMIT 1; rewrite via the same
  * `passes` leftmost-non-overlapping REPLACEs both engines share —
  * q155's proof). The learned table satisfies the [[graft.functions
  * .TextOps.BpeMerges]] invariant BY CONSTRUCTION (a round-i pair's
  * parts are base characters or outputs of rounds < i), so rank-order
  * application of the result ≡ greedy BPE — with one pinned boundary:
  * a SELF-PAIR merge (l == r) applied to a run diverges from textbook
  * exhaustive re-scan (one pass of (a,a) over 'aaaaaa' gives
  * [aa, a, aa, a], not [aa, aa, aa], because a match consumes its
  * trailing sentinel space; all three engines share this, so training
  * and the hash gate stay consistent — BpeTrainerSpec pins it). */
object BpeTrainer {

  /** The " a b c " sentinel segmentation — identical to
    * TextOps.bpeTokenCount's constructor, so tables learned here apply
    * through q155/q163's replace chains unchanged. Shared with q163's
    * distinct-word encode (one definition, not two copies). */
  def segWord(w: String): String =
    " " + w.map(_.toString).mkString(" ") + " "

  /** Learn `rounds` merges from `wc` — a (w STRING, c LONG-castable)
    * vocabulary whose words contain no spaces. Returns the merge table
    * as (rank, left, right, pairCount) — `rounds` rows (fewer if the
    * vocabulary degenerates to single symbols first). */
  def train(wc: DataFrame, rounds: Int, passes: Int = 6)
      : Seq[(Int, String, String, Long)] = {
    val segInit = udf(segWord _)
    var vocab = wc
      .select(segInit(col("w")).as("seg"), col("c").cast("long").as("c"))
      .localCheckpoint(true) // corpus scan + vocab agg run ONCE
    val merges = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    var round = 1
    while (round <= rounds) {
      val win = vocab
        .select(col("c"), expr("filter(split(seg, ' '), x -> x != '')").as("s"))
        .filter(size(col("s")) >= 2)
        .select(col("c"), explode(expr(
          "transform(sequence(1, size(s) - 1), " +
            "i -> struct(element_at(s, i) AS l, element_at(s, i + 1) AS r))"))
          .as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("c").as("cnt"))
        // total order ⇒ the argmax is deterministic and oracle-replayable
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).collect() // bounded: ONE row per round
      if (win.isEmpty) return merges.toSeq // no pairs left anywhere
      val l = win(0).getString(0)
      val r = win(0).getString(1)
      merges += ((round, l, r, win(0).getLong(2)))
      // exhaustive merge: `passes` leftmost-non-overlapping replaces
      // close runs up to 2^passes pairs (the q155 BpePasses argument)
      val pat = lit(s" $l $r ")
      val rep = lit(s" $l$r ")
      val rewritten = (1 to passes).foldLeft(col("seg")) { (c, _) =>
        call_function("replace", c, pat, rep)
      }
      vocab = vocab.select(rewritten.as("seg"), col("c"))
      // rewrites stay LAZY on top of the one checkpointed vocab — round
      // i's argmax recomputes ≤ i codegen'd replace maps over the vocab
      // (O(rounds²) vocab-scale map work, trivial) instead of paying a
      // materialization JOB per round; the 10 sequential argmax jobs
      // dominate q156's wall time either way at sf0.1 (~1.5 s), but at
      // real vocab scale the saved job is a saved stage. A checkpoint
      // every 8 rounds caps expression-tree depth for large `rounds`.
      if (round % 8 == 0) vocab = vocab.localCheckpoint(true)
      round += 1
    }
    merges.toSeq
  }
}
