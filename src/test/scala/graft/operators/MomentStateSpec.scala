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
}
