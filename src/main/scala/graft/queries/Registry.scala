package graft.queries

/** All queries exposed through SparkEntry. Milestones append here. */
object Registry {
  def all: Seq[QueryDef] = LakeQueries.defs ++ RelQueries.defs ++ LlmQueries.defs

  def queries: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] =
    all.map(d => d.name -> d.run).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(d => d.oracle.map(o => d.name -> o.linesIterator.map(_.trim).mkString(" ").trim)).toMap
}
