package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all suites (one JVM-wide session, lazy). */
object SparkSpec {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .appName("graft-test")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft-spark-wh").toString)
    .config("spark.sql.extensions", "graft.lake.LakeExtensions")
    .config("spark.sql.catalog.lake", "graft.lake.LakeSparkCatalog")
    .config("spark.sql.catalog.glue_catalog", "graft.lake.LakeSparkCatalog")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true") // events.ts
    // INT64 micros so timestamp columns carry orderable footer stats
    .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = SparkSpec.spark
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf: String = "/root/testdata/sf0.001"

  /** Task input bytes read while `f` runs — the MaintenanceSpec
    * footprint meter (VERDICT r17 #4), shared so every standing-state
    * family can gate its O(changed) claim. Polls until the listener
    * bus drains. */
  def meteredBytesRead(f: => Unit): Long = {
    val bytesRead = new java.util.concurrent.atomic.AtomicLong()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null)
          bytesRead.addAndGet(e.taskMetrics.inputMetrics.bytesRead)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      f
      var last = -1L
      var spins = 0
      while (bytesRead.get() != last && spins < 50) {
        last = bytesRead.get(); Thread.sleep(100); spins += 1
      }
    } finally spark.sparkContext.removeSparkListener(listener)
    bytesRead.get()
  }
}
