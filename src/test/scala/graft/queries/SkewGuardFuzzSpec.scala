package graft.queries

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Randomized equivalence checks for the r9 skew guards: each guarded
  * path claims to be a pure re-partitioning of its naive spelling —
  * identical output on ANY input — so fuzz the claim on seeded random
  * inputs where hand-picked fixtures might miss an interaction (labels
  * straddling the threshold, strata tied at the quota boundary, graphs
  * mixing chains, cliques and singletons). Iteration counts are small
  * (inputs are tiny); seeds are fixed so failures reproduce. */
class SkewGuardFuzzSpec extends SparkSpec {

  test("fuzz: triangle-blocked label pairs == plain label pairs") {
    for (seed <- 1 to 3) {
      val r = new scala.util.Random(seed)
      val nLabels = 1 + r.nextInt(4)
      val rows = (0 until 150).map { i =>
        Row(s"L${r.nextInt(nLabels)}", i.toLong,
          Seq.fill(4)(r.nextDouble()))
      }
      val schema = StructType(Seq(
        StructField("label", StringType), StructField("vec_id", LongType),
        StructField("embedding", ArrayType(DoubleType))))
      val e = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 4), schema)
      val threshold = 1 + r.nextInt(60) // some labels above, some below
      val blocks = 2 + r.nextInt(6)
      def key(df: org.apache.spark.sql.DataFrame) = df
        .select(col("label"), col("vec_a"), col("vec_b"),
          round(col("sim_raw"), 9))
        .collect().map(_.toSeq).toSet
      val naive = key(LlmQueries.labelPairs(e))
      val guarded = key(LlmQueries.labelPairsSkewSafe(e, threshold, blocks))
      assert(guarded == naive,
        s"seed=$seed threshold=$threshold blocks=$blocks: " +
          s"${(naive -- guarded).size} missing, ${(guarded -- naive).size} extra")
    }
  }

  test("fuzz: two-phase stratified top-k == naive window") {
    for (seed <- 1 to 3) {
      val r = new scala.util.Random(100 + seed)
      val nStrata = 1 + r.nextInt(3)
      val rows = (0 until 400).map { i =>
        Row(s"s${r.nextInt(nStrata)}", i.toLong, 1L + r.nextInt(50),
          (0 until 5).map(_ => s"t${r.nextInt(1000)}").mkString(" "))
      }
      val schema = StructType(Seq(
        StructField("lang", StringType), StructField("doc_id", LongType),
        StructField("n_chars", LongType), StructField("text", StringType)))
      val docs = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 4), schema)
      val quota = 1 + r.nextInt(120)
      val salts = 2 + r.nextInt(8)
      def ids(df: org.apache.spark.sql.DataFrame) =
        df.select("lang", "doc_id").collect()
          .map(r => (r.getString(0), r.getLong(1))).toSet
      val naive = ids(LlmQueries.stratifiedTopK(docs, "lang", quota,
        skewThreshold = Long.MaxValue))
      val guarded = ids(LlmQueries.stratifiedTopK(docs, "lang", quota,
        skewThreshold = 0L, salts = salts))
      assert(guarded == naive, s"seed=$seed quota=$quota salts=$salts")
    }
  }

  test("fuzz: two-phase skyline == brute-force Pareto filter (ties included)") {
    for (seed <- 1 to 3) {
      val r = new scala.util.Random(300 + seed)
      // coarse grids force equal-price groups, equal-size collisions and
      // full duplicates — exactly the tie cases the sorted scan must get
      // right
      val rows = (0 until 200).map { i =>
        Row(i.toLong, (r.nextInt(12) * 1.5), 1 + r.nextInt(10))
      }
      val schema = StructType(Seq(
        StructField("p_partkey", LongType),
        StructField("p_retailprice", DoubleType),
        StructField("p_size", IntegerType)))
      val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 5), schema)
      val pts = rows.map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
      val expected = pts.filter { a =>
        !pts.exists(b => b._2 <= a._2 && b._3 >= a._3 &&
          (b._2 < a._2 || b._3 > a._3))
      }.map(_._1).toSet
      val got = RelQueries.skylineOf(df).collect().map(_.getLong(0)).toSet
      assert(got == expected,
        s"seed=$seed: missing ${expected -- got}, extra ${got -- expected}")
    }
  }

  test("fuzz: CC fast path == distributed star alternation == reference BFS") {
    for (seed <- 1 to 3) {
      val r = new scala.util.Random(200 + seed)
      val n = 30
      val edges = (0 until 40).map { _ =>
        val a = r.nextInt(n).toLong; val b = r.nextInt(n).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(e => e._1 != e._2).distinct
      if (edges.nonEmpty) {
        // reference: in-test BFS labeling to each component's minimum
        val adj = edges.flatMap(e => Seq(e, e.swap))
          .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
        val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
        val label = scala.collection.mutable.HashMap[Long, Long]()
        nodes.sorted.foreach { start =>
          if (!label.contains(start)) {
            var frontier = Set(start)
            while (frontier.nonEmpty) {
              frontier.foreach(label(_) = start)
              frontier = frontier.flatMap(adj.getOrElse(_, Nil))
                .filterNot(label.contains)
            }
          }
        }
        val df = spark.createDataFrame(edges).toDF("doc_a", "doc_b")
        def cc(threshold: Long) =
          LlmQueries.connectedComponents(df, localThreshold = threshold)
            .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(cc(Long.MaxValue) == label.toMap, s"seed=$seed fast path")
        assert(cc(0L) == label.toMap, s"seed=$seed distributed path")
      }
    }
  }
}
