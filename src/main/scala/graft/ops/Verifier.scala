package graft.ops

import graft.lake.{LakeCatalog, UnsupportedV2DeletesException}

final case class Probe(
    name: String,
    ok: Boolean,
    critical: Boolean,
    detail: String)

final case class VerifyReport(table: String, probes: Seq[Probe]) {
  /** Non-critical probe failures don't flip the verdict
    * (verify_in_databricks.py:100-109: COUNT is informational). */
  def ok: Boolean = probes.filter(_.critical).forall(_.ok)
}

/** §2.12 / S9: the reference's 3-probe readability verifier
  * (/root/reference/internal/verify_in_databricks.py:57-112) —
  * DESCRIBE → SELECT * LIMIT 5 → COUNT(*), short-circuiting after a
  * critical failure, with the Iceberg-v2-MoR error classification hint
  * (:93-97) and client-side row/error truncation (O3: rows[:3],
  * error[:500]).
  *
  * `strict = true` models the remote reader without v2 delete-file
  * support (the Databricks side of the reference's story); `false` is a
  * plain engine self-check.
  */
class Verifier(catalog: LakeCatalog, strict: Boolean = true) {

  def verify(db: String, table: String): VerifyReport =
    catalog.loadTable(db, table) match {
      case None => VerifyReport(s"$db.$table",
        Seq(Probe("describe", ok = false, critical = true, "table not found")))
      case Some(t) => probeAll(s"$db.$table", t)
    }

  private def probeAll(name: String, t: graft.lake.LakeTable): VerifyReport = {
    val describe =
      try {
        val cols = t.describe().collect()
          .map(r => s"${r.getString(0)}:${r.getString(1)}")
        Probe("describe", ok = true, critical = true,
          s"${cols.length} columns: ${cols.mkString(", ").take(200)}")
      } catch {
        case e: Exception =>
          Probe("describe", ok = false, critical = true, classify(e))
      }
    if (!describe.ok) return VerifyReport(name, Seq(describe))

    val select =
      try {
        val rows = t.read(strict = strict).limit(5).collect()
        val overflow = // verify_in_databricks.py:89-90's "... and N more"
          if (rows.length > 3) s" … and ${rows.length - 3} more" else ""
        Probe("select_limit", ok = true, critical = true,
          s"${rows.length} row(s); first: " +
            rows.take(3).map(_.toString.take(200)).mkString(" | ") + overflow)
      } catch {
        case e: Exception =>
          Probe("select_limit", ok = false, critical = true, classify(e))
      }
    if (!select.ok) return VerifyReport(name, Seq(describe, select))

    val count =
      try {
        val n = t.read(strict = strict).count()
        Probe("count", ok = true, critical = false, s"count = $n")
      } catch {
        case e: Exception =>
          Probe("count", ok = false, critical = false, classify(e))
      }
    VerifyReport(name, Seq(describe, select, count))
  }

  /** Error classification, mirroring the reference's hint that a v2-MoR
    * read failure means "upgrade the table to v3"
    * (verify_in_databricks.py:93-97). */
  private def classify(e: Exception): String = e match {
    case _: UnsupportedV2DeletesException =>
      ("UNSUPPORTED_V2_DELETES: " + e.getMessage +
        " — hint: upgrade to format-version 3 and compact " +
        "(Upgrader.upgrade, or CALL lake.system.upgrade)").take(500)
    case _ =>
      val msg = Option(e.getMessage).getOrElse(e.toString)
      // keyword fallback mirroring the reference's substring check
      // (verify_in_databricks.py:94-96): a format-smelling failure that
      // isn't our typed exception still gets the remediation pointer
      val up = msg.toUpperCase
      val hint =
        if (up.contains("FORMAT-VERSION") || up.contains("DELETE FILE") ||
            up.contains("MERGE-ON-READ"))
          " — hint: this looks like a table-format issue; run the " +
            "upgrade (Upgrader.upgrade) and re-verify"
        else ""
      (msg + hint).take(500)
  }
}
