package graft.queries

import org.apache.spark.sql.functions.col
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
      // The df head is capped corpus-independently at scale (VERDICT r6
      // #1); losslessness must survive ANY head choice. headMax = 1 is
      // the pathological extreme: all but one class fall back to the
      // df≈0 hash-ordered tail, exactly what a 100 TB corpus's tail
      // classes see.
      val candTinyHead = LlmQueries.prefixCandidates(docsSh, headMax = 1)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(truth.subsetOf(candTinyHead),
        s"seed $seed: capped df-head lost ${truth -- candTinyHead} true pairs")
    }
  }

  test("regime partition: q34/q35 END-TO-END lose no short-regime pair " +
    "on adversarial corpora (the exact-cover guarantee, seeded fuzz)") {
    // The r15 partition makes the short regime (both sides < 80
    // shingles) EXACT for the full registry queries — bandable or not.
    // genCorpus docs are all ≤ ~26 tokens (< 25 shingles), so EVERY
    // true pair here sits in the exact regime: set containment is the
    // right assertion, not planted-dup recall. Runs the real q34/q35
    // against a temp parquet dir per seed, so the guarantee is pinned
    // through collapseExactDups, the partition, verify AND expansion.
    import spark.implicits._
    for (seed <- 21L to 23L) {
      val corpus = genCorpus(seed)
      val truth = exactPairs(corpus)
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft-partition-$seed").toString
      corpus.toDF("doc_id", "text")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      for (q <- Seq("q34_minhash_neardup", "q35_simhash_neardup")) {
        val got = Registry.queries(q)(spark, dir).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(truth.subsetOf(got),
          s"seed $seed $q lost ${truth -- got} of ${truth.size} true pairs")
        assert(got.subsetOf(truth), // exact verify ⇒ no false positives
          s"seed $seed $q extras ${got -- truth}")
      }
    }
  }

  test("banding paths survive >1000 identical documents " +
    "(exact-dup pre-collapse; dropped-bucket metric stays 0)") {
    import spark.implicits._
    // 1100 byte-identical copies would share every band signature: without
    // the exact-dup pre-collapse the 1000-member bucket cap silently drops
    // ALL of this corpus's pairs (VERDICT r6 #4). With it, the text bands
    // once and the 1100·1099/2 intra-class pairs are reconstructed.
    val nCopies = 1100
    val base = (0 until 12).map(i => s"tok$i").mkString(" ")
    val copies = (0L until nCopies.toLong).map(i => (i, base))
    // a near-dup pair across DIFFERENT texts must still flow through the
    // banding + verify path: 100 tokens, last mutated — 97 shared of 101
    // distinct shingles, jac ≈ 0.9604 ≥ 0.8
    val nd1 = (5000L, (0 until 100).map(i => s"w$i").mkString(" "))
    val nd2 = (5001L, ((0 until 99).map(i => s"w$i") :+ "wx").mkString(" "))
    val corpus = copies :+ nd1 :+ nd2

    val dir = java.nio.file.Files.createTempDirectory("graft-neardup-big")
    corpus.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")

    // capture the observed dropped-bucket metrics for this run
    val seen = new java.util.concurrent.ConcurrentHashMap[String, Long]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution, d: Long): Unit =
        qe.observedMetrics.foreach { case (name, row) =>
          if (name.endsWith("_buckets"))
            seen.merge(name, row.getAs[Long]("dropped_buckets"), Math.max(_, _))
        }
      override def onFailure(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val expectedWithin = nCopies.toLong * (nCopies - 1) / 2
      for (q <- Seq(LlmQueries.q34, LlmQueries.q35)) {
        val out = q.run(spark, dir.toString)
        val n = out.count()
        assert(n == expectedWithin + 1,
          s"${q.name}: got $n pairs, want $expectedWithin identical + 1 near-dup")
        assert(out.filter(col("doc_a") === 5000L && col("doc_b") === 5001L)
          .head().getDouble(2) > 0.8, s"${q.name}: near-dup pair lost")
        assert(out.filter(col("jac") === 1.0).count() == expectedWithin,
          s"${q.name}: intra-class pairs must all carry jac = 1.0")
      }
      // the listener sees metrics asynchronously; poll until delivered
      val deadline = System.currentTimeMillis() + 30000
      while (System.currentTimeMillis() < deadline &&
        !(seen.containsKey("q34_lsh_buckets") &&
          seen.containsKey("q35_simhash_buckets"))) Thread.sleep(100)
      assert(seen.containsKey("q34_lsh_buckets") &&
        seen.containsKey("q35_simhash_buckets"),
        s"bucket metrics not observed: ${seen.keySet()}")
      assert(seen.values().stream().allMatch(_ == 0L),
        s"pre-collapsed corpus must drop no buckets: $seen")
    } finally spark.listenerManager.unregister(listener)
  }
}
