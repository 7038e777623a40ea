package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The dump-or-error invariant of the driver contract (VERDICT r7 #2): a
  * query that throws must surface as an errors.json row — it can never be
  * simply absent from the verify output the driver builds the correctness
  * report from. */
class VerifyContractSpec extends SparkSpec {

  test("every query yields a parquet dump or an errors.json row — " +
    "a deliberately broken query cannot vanish") {
    val out = Files.createTempDirectory("graft-verify").toString
    val good = (s: SparkSession, dir: String) =>
      Tables(s, dir, "region").select("r_regionkey")
    val broken = (s: SparkSession, dir: String) =>
      Tables(s, dir, "region").selectExpr("no_such_column + 1")
    val queries = Map[String, (SparkSession, String) => DataFrame](
      "qgood" -> good, "qbroken" -> broken)

    val errors = Verify.run(spark, sf, out, queries,
      Map("qgood" -> "SELECT r_regionkey FROM region"))

    for (name <- queries.keys) {
      val dumped = Files.exists(Paths.get(s"$out/$name/_SUCCESS"))
      assert(dumped || errors.contains(name),
        s"$name left no trace: neither parquet dump nor error row")
    }
    assert(errors.keySet == Set("qbroken"))
    assert(Files.exists(Paths.get(s"$out/qgood/_SUCCESS")))
    assert(!Files.exists(Paths.get(s"$out/qbroken/_SUCCESS")))
    val errJson = Files.readString(Paths.get(s"$out/errors.json"))
    assert(errJson.contains("qbroken"), s"errors.json missing the row: $errJson")
    // full-registry sanity: the shipped queries/oracles stay aligned —
    // an oracle for a name with no query would silently weaken the gate
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
