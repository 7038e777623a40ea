package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.lake.LakeCatalog

/** [[MomentState]] (X56): the maintained cells must be BIT-IDENTICAL to
  * a from-scratch [[PcaPower.moments]] recompute over the current
  * corpus after any sequence of add/retire/re-embed deltas — exact
  * decimal sums form a group, and this spec is the group-law check on
  * random data (the q185 oracle then checks the same identity through
  * the full downstream analysis). */
class MomentStateSpec extends SparkSpec {

  private val d = 8
  private val vecSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("v", ArrayType(DoubleType))))
  private def df(rs: Seq[(Long, Array[Double])]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rs.map { case (i, v) => Row(i, v.toSeq) }, 2), vecSchema)

  test("delta-maintained moments ≡ from-scratch recompute, bit for bit, " +
    "across random add/retire/re-embed sequences") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed * 71)
      def fresh(): Array[Double] = Array.fill(d)(rnd.nextDouble() * 4 - 2)
      var corpus = (1L to 20L).map(i => i -> fresh())
      val wh = Files.createTempDirectory(s"graft-mom-wh$seed")
      val cat = new LakeCatalog(spark, wh)
      cat.createNamespace("pca")
      MomentState.provision(cat, "pca", df(corpus), d)

      var nextId = 100L
      for (step <- 1 to 4) {
        val op = rnd.nextInt(3)
        val (removed, added) = op match {
          case 0 => // batch append
            val b = Seq.fill(3)({ nextId += 1; nextId -> fresh() })
            (Seq.empty[(Long, Array[Double])], b)
          case 1 => // retire
            val r = rnd.shuffle(corpus).take(rnd.nextInt(3) + 1)
            (r, Seq.empty[(Long, Array[Double])])
          case _ => // re-embed (retire old cells, add new)
            val r = rnd.shuffle(corpus).take(rnd.nextInt(3) + 1)
            (r, r.map { case (i, _) => i -> fresh() })
        }
        MomentState.applyDelta(cat, "pca", df(removed), df(added), d)
        val removedIds = removed.map(_._1).toSet
        corpus = corpus.filterNot { case (i, _) => removedIds(i) } ++ added

        val (mn, mmu, mmom) = MomentState.load(cat, "pca", d)
        val (rn, rmu, rmom) = PcaPower.moments(spark, df(corpus), d)
        assert(mn == rn, s"seed=$seed step=$step count $mn != $rn")
        for (i <- 0 until d) {
          assert(mmu(i).compareTo(rmu(i)) == 0,
            s"seed=$seed step=$step mu($i): ${mmu(i)} != ${rmu(i)}")
          for (j <- i until d)
            assert(mmom(i)(j).compareTo(rmom(i)(j)) == 0,
              s"seed=$seed step=$step mom($i,$j): " +
                s"${mmom(i)(j)} != ${rmom(i)(j)}")
        }
      }
    }
  }

  test("delta watermark (ADVICE r18 #2): a resumed maintainer detects " +
    "the crash between the corpus commit and the moments overwrite by " +
    "comparing the stamp against the source snapshot id") {
    val rnd = new scala.util.Random(7)
    def fresh(): Array[Double] = Array.fill(d)(rnd.nextDouble())
    val corpus = (1L to 10L).map(i => i -> fresh())
    val wh = Files.createTempDirectory("graft-momwm-wh")
    val cat = new LakeCatalog(spark, wh)
    cat.createNamespace("pca")
    // the governed source table whose snapshot ids the maintainer stamps
    cat.createTable("pca", "corpus", vecSchema,
      props = Map("write.delete.mode" -> "merge-on-read"))
      .append(df(corpus))
    def corpusSnap(): Long =
      cat.loadTable("pca", "corpus").get.currentSnapshot.get.id
    MomentState.provision(cat, "pca", df(corpus), d, token = corpusSnap())
    assert(MomentState.watermark(cat, "pca") == corpusSnap())

    // a completed maintenance event: corpus commit, then the stamped
    // moments delta — watermark agrees with the corpus again
    val batch = Seq(50L -> fresh(), 51L -> fresh())
    cat.loadTable("pca", "corpus").get.append(df(batch))
    MomentState.applyDelta(cat, "pca", df(Nil), df(batch), d,
      token = corpusSnap())
    assert(MomentState.watermark(cat, "pca") == corpusSnap())

    // the CRASH: the corpus commit lands, the process dies before the
    // moments overwrite — a resumed maintainer sees corpus ahead of the
    // stamp (the half-applied delta is DETECTED, not silently trusted)
    val batch2 = Seq(60L -> fresh())
    cat.loadTable("pca", "corpus").get.append(df(batch2))
    assert(MomentState.watermark(cat, "pca") < corpusSnap(),
      "an unapplied delta must be visible as stamp < corpus snapshot")
    // recovery: re-derive the missing delta from the corpus diff
    // (readIncremental from the stamped snapshot IS that diff), re-apply
    val stamp = MomentState.watermark(cat, "pca")
    val missing = cat.loadTable("pca", "corpus").get
      .readIncremental(Some(stamp), corpusSnap())
    MomentState.applyDelta(cat, "pca", df(Nil), missing, d,
      token = corpusSnap())
    assert(MomentState.watermark(cat, "pca") == corpusSnap())
    val (mn, mmu, mmom) = MomentState.load(cat, "pca", d)
    val (rn, rmu, rmom) = PcaPower.moments(spark,
      df(corpus ++ batch ++ batch2), d)
    assert(mn == rn)
    for (i <- 0 until d; j <- i until d)
      assert(mmu(i).compareTo(rmu(i)) == 0 &&
        mmom(i)(j).compareTo(rmom(i)(j)) == 0,
        "the recovered cells must equal the recompute bit-for-bit")
  }

  test("applyDelta footprint is O(changed·d²), measured (VERDICT r18 " +
    "#5): a delta derived from the corpus diff reads the changed files " +
    "and the moment cells — never the standing corpus") {
    val rnd = new scala.util.Random(13)
    def fresh(): Array[Double] = Array.fill(d)(rnd.nextDouble())
    // a standing corpus big enough that a rescan would dominate the meter
    val corpus = (1L to 3000L).map(i => i -> fresh())
    val wh = Files.createTempDirectory("graft-momfoot-wh")
    val cat = new LakeCatalog(spark, wh)
    cat.createNamespace("pca")
    val corpusT = cat.createTable("pca", "corpus", vecSchema,
      props = Map("write.delete.mode" -> "merge-on-read"))
      .append(df(corpus))
    val standingBytes = corpusT.dataFiles.map(_.sizeBytes).sum
    MomentState.provision(cat, "pca", corpusT.read(), d,
      token = corpusT.currentSnapshot.get.id)

    // the nightly event: a batch lands on the corpus, the maintainer
    // folds in EXACTLY the diff (readIncremental reads only the files
    // the batch commit added)
    val batch = (5001L to 5010L).map(i => i -> fresh())
    val before = cat.loadTable("pca", "corpus").get.currentSnapshot.get.id
    val after = cat.loadTable("pca", "corpus").get.append(df(batch))
    val bytes = meteredBytesRead {
      MomentState.applyDelta(cat, "pca", df(Nil),
        after.readIncremental(Some(before), after.currentSnapshot.get.id),
        d, token = after.currentSnapshot.get.id)
    }
    assert(bytes < standingBytes / 5,
      s"applyDelta read $bytes bytes (standing corpus holds " +
        s"$standingBytes — looks like a corpus rescan)")
    // and the cells still equal the recompute
    val (mn, _, _) = MomentState.load(cat, "pca", d)
    assert(mn == 3010L)
  }

  test("retention (VERDICT r18 stretch #8): per-event moments " +
    "overwrites expire under the provisioned history.expire.* policy " +
    "without touching the maintained cells") {
    val rnd = new scala.util.Random(11)
    def fresh(): Array[Double] = Array.fill(d)(rnd.nextDouble())
    val corpus = (1L to 8L).map(i => i -> fresh())
    val wh = Files.createTempDirectory("graft-momret-wh")
    val cat = new LakeCatalog(spark, wh)
    cat.createNamespace("pca")
    MomentState.provision(cat, "pca", df(corpus), d)
    var all = corpus
    for (e <- 1 to 5) {
      val b = Seq((100L + e) -> fresh())
      MomentState.applyDelta(cat, "pca", df(Nil), df(b), d)
      all = all ++ b
    }
    val t = cat.loadTable("pca", "moments").get
    assert(t.meta.snapshots.size == 6, "one overwrite per event accrued")
    val (olderThan, retain) = graft.lake.Procedures.expireDefaults(t,
      System.currentTimeMillis() + 8L * 24 * 3600 * 1000)
    val res = graft.lake.Procedures.expireSnapshots(t, olderThan, retain)
    assert(res.table.meta.snapshots.size == 3,
      s"expiry must trim to min-snapshots-to-keep: " +
        s"${res.table.meta.snapshots.size}")
    // the maintained cells are untouched and the arc keeps working
    val (mn, mmu, mmom) = MomentState.load(cat, "pca", d)
    val (rn, rmu, rmom) = PcaPower.moments(spark, df(all), d)
    assert(mn == rn)
    for (i <- 0 until d; j <- i until d)
      assert(mmu(i).compareTo(rmu(i)) == 0 &&
        mmom(i)(j).compareTo(rmom(i)(j)) == 0)
    MomentState.applyDelta(cat, "pca", df(Nil), df(Seq(200L -> fresh())), d)
    assert(MomentState.load(cat, "pca", d)._1 == rn + 1)
  }
}
