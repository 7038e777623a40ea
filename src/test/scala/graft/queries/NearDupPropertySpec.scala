package graft.queries

import org.scalacheck.{Gen, rng}

import graft.SparkSpec
import graft.functions.TextOps

/** Property test of q56's prefix-filter candidate generation: for ANY
  * corpus, every pair with exact 3-gram Jaccard ≥ 0.8 must appear in
  * [[LlmQueries.prefixCandidates]]' output — the filter is lossless by
  * construction (pigeonhole on the rare-first prefix), not
  * with-high-probability like the MinHash/SimHash banding paths, so the
  * right assertion is set containment on adversarial inputs, not recall
  * on planted dups.
  *
  * The generator is deliberately hostile: a tiny shared vocabulary (high
  * shingle document frequency → big posting buckets → worst case for the
  * rare-first heuristic), documents shorter than one shingle (empty
  * sets), exact copies (jac = 1), and one-token mutations straddling the
  * 0.8 boundary.
  */
class NearDupPropertySpec extends SparkSpec {

  private def genCorpus(seed: Long): Seq[(Long, String)] = {
    val vocabSize = 12 // tiny on purpose: forces shared shingles
    val gen = for {
      nBase <- Gen.choose(8, 16)
      bases <- Gen.listOfN(nBase, for {
        len <- Gen.choose(0, 24) // includes < 3 tokens → empty shingle set
        toks <- Gen.listOfN(len, Gen.choose(0, vocabSize - 1).map(i => s"w$i"))
      } yield toks)
      nDup <- Gen.choose(2, 5)
      dups <- Gen.listOfN(nDup, for {
        src <- Gen.choose(0, nBase - 1)
        nMut <- Gen.choose(0, 2) // 0 = exact copy
        posSeed <- Gen.choose(0, 1 << 20)
      } yield (src, nMut, posSeed))
    } yield {
      val baseDocs = bases.zipWithIndex.map { case (tk, i) =>
        (i.toLong, tk.mkString(" "))
      }
      val dupDocs = dups.zipWithIndex.map { case ((src, nMut, posSeed), j) =>
        val tk = bases(src).toArray
        val r = new scala.util.Random(posSeed)
        (0 until math.min(nMut, tk.length))
          .foreach(_ => tk(r.nextInt(tk.length)) = s"mut$j")
        (100L + j, tk.mkString(" "))
      }
      baseDocs ++ dupDocs
    }
    gen.apply(Gen.Parameters.default, rng.Seed(seed))
      .getOrElse(sys.error("corpus generator failed"))
  }

  private def exactPairs(corpus: Seq[(Long, String)]): Set[(Long, Long)] = {
    val sh = corpus.map { case (id, text) => id -> TextOps.shingleSet(text).toSet }
    (for {
      (ia, sa) <- sh; (ib, sb) <- sh
      if ia < ib && sa.nonEmpty && sb.nonEmpty
      inter = (sa & sb).size
      if inter.toDouble / (sa.size + sb.size - inter) >= 0.8
    } yield (ia, ib)).toSet
  }

  test("prefix filtering loses no Jaccard-0.8 pair on adversarial corpora") {
    import spark.implicits._
    for (seed <- 11L to 15L) {
      val corpus = genCorpus(seed)
      val truth = exactPairs(corpus)
      val docsSh = corpus.toDF("doc_id", "text").as[(Long, String)]
        .map { case (id, text) => (id, TextOps.shingleSet(text)) }
        .toDF("doc_id", "sh")
      val cand = LlmQueries.prefixCandidates(docsSh)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(truth.subsetOf(cand),
        s"seed $seed: prefix filter lost ${truth -- cand} of ${truth.size} true pairs")
    }
  }
}
