package graft.queries

/** All queries exposed through SparkEntry. Milestones append here. */
object Registry {
  def all: Seq[QueryDef] = LakeQueries.defs ++ RelQueries.defs ++ LlmQueries.defs

  def queries: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] =
    all.map(d => d.name -> d.run).toMap

  /** Oracles are flattened to one line for the JSON contract. Flattening
    * would silently corrupt `--` line comments or literals with embedded
    * newlines (VERDICT r1 #8), so those are rejected at construction. */
  def oracleSql: Map[String, String] =
    all.flatMap(d => d.oracle.map { o =>
      require(!o.contains("--"),
        s"${d.name}: oracle contains '--'; newline flattening would corrupt it")
      require(!o.contains("'") || !o.linesIterator.exists(l =>
        l.count(_ == '\'') % 2 == 1),
        s"${d.name}: oracle has a string literal spanning lines")
      d.name -> o.linesIterator.map(_.trim).mkString(" ").trim
    }).toMap
}
