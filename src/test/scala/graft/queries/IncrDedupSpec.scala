package graft.queries

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

/** q167 semantics pin: incremental dedup of a NEW batch (doc_id % 10 >=
  * 8) against the STORED lake state must find planted near-dups both
  * ACROSS the batch boundary and WITHIN the batch, and must never emit
  * stored × stored pairs — those were (by the operational contract)
  * already deduped when the standing corpus was built. */
class IncrDedupSpec extends SparkSpec {

  private def doc(seed: Int, n: Int = 40): String = {
    val r = new scala.util.Random(seed)
    (0 until n).map(_ => s"w${r.nextInt(1000000)}").mkString(" ")
  }

  test("planted pairs: cross-batch and within-batch found, " +
    "stored-only pair excluded, repeat run stable") {
    // ids chosen against IncrNewPred (doc_id % 10 >= 8):
    //   stored: 1, 2, 3, 10..16, 20..26     new: 8, 18, 28, 38
    val d1 = doc(100) // stored
    val d3 = doc(300) // stored
    val d28 = doc(2800) // new
    val rows = Seq(
      1L -> d1,
      2L -> d1.replaceFirst("w\\d+", "changed"), // stored×stored — OUT
      3L -> d3,
      18L -> d3.replaceFirst("w\\d+", "changed"), // cross — IN
      28L -> d28,
      38L -> d28.replaceFirst("w\\d+", "changed"), // new×new — IN
      8L -> doc(800) // new, no partner
    ) ++ (0 until 12).map(i => (10L + i / 6 * 10 + i % 6) -> doc(9000 + i))
    val dir = java.nio.file.Files.createTempDirectory("graft-incr-spec").toString
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (i, t) => Row(i, t) }, 4),
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def run() = Registry.queries("q167_incremental_neardup")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = run()
    assert(got == Set((3L, 18L), (28L, 38L)),
      s"expected exactly the cross + within-batch pairs, got $got")
    // second invocation reuses the memoized lake state and must agree
    assert(run() == got)
  }
}
