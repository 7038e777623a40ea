package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Dev tool for the optimization rounds: dump `.explain("formatted")`
  * for named registry queries into `<outDir>/<name>_<tag>.txt` so plan
  * claims in OPTIMIZATION_*.md are checkable without running Spark.
  * Same session config as [[Bench]] (the plans must be the ones the
  * bench executes). Not part of the driver contract; never timed.
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> <tag> <query>[,query...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: PlanDump <sfDir> <outDir> <tag> <query>[,query...]")
    val Array(sfDir, outDir, tag) = args.take(3)
    val names = args.drop(3).flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4096")
      .config("spark.sql.extensions", "graft.lake.LakeExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { n =>
      val full = SparkEntry.queries.keys.find(k => k == n || k.startsWith(n + "_"))
        .getOrElse(sys.error(s"unknown query $n"))
      val df = SparkEntry.queries(full)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(outDir, s"${full}_$tag.txt"), plan)
      println(s"[plandump] wrote $outDir/${full}_$tag.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
