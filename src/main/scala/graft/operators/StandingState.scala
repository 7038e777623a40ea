package graft.operators

/** Shared posture of the standing-state maintenance family (X49/X50,
  * X56/X57, X58): tiny high-churn tables (counters, moment cells, index
  * watermarks) take one overwrite snapshot PER maintenance event — a
  * nightly pipeline accretes ~365/year on each — so they carry their own
  * M53 retention policy and a bare `CALL expire_snapshots(table)` honors
  * it (VERDICT r18 stretch #8; RetentionSpec proves expiry composes with
  * the maintained-state arcs). */
object StandingState {

  /** Default expiry for per-event-overwrite state tables: keep a week of
    * history and never fewer than 3 snapshots (enough to diagnose the
    * last few maintenance events). */
  val Retention: Map[String, String] = Map(
    "history.expire.max-snapshot-age-ms" -> (7L * 24 * 3600 * 1000).toString,
    "history.expire.min-snapshots-to-keep" -> "3")
}
