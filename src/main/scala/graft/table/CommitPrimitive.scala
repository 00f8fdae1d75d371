package graft.table

import java.nio.file.{FileAlreadyExistsException, Files, Path}

/** The single storage operation the whole ACID story rests on: atomically
  * publish one snapshot document at a version-numbered destination IFF
  * nothing exists there yet ("compare-and-swap on absence"). Everything
  * else in the commit protocol — staging data files, building the file
  * list, rebase-and-retry — is ordinary idempotent work; this one call is
  * the commit point, so it is isolated behind a trait.
  *
  * Strategy per storage system (the reference's premise is S3 + S3 Tables,
  * reference `demo-setup/terraform/main.tf:1-96`, where Iceberg's catalog
  * provides this primitive as a service):
  *  - **POSIX / HDFS**: hard-link (here) or atomic rename-without-replace
  *    — [[CommitPrimitive.PosixHardLink]].
  *  - **S3**: conditional PUT with `If-None-Match: *` (supported since
  *    2024) — one round trip, no coordinator; before that, a DynamoDB
  *    lock/log table arbitrating writers, the design of Delta's
  *    `S3DynamoDBLogStore` and Iceberg's `DynamoDbLockManager`.
  *  - **GCS / ADLS**: native preconditions (`x-goog-if-generation-match:
  *    0` / `If-None-Match: *`) — both stores are CAS-capable directly.
  * All three give the same contract as `link()`: exactly one concurrent
  * writer observes success; every loser sees a deterministic failure and
  * rebases. Nothing else in [[SnapshotTable]] assumes POSIX semantics at
  * the commit point, so porting to an object store means implementing
  * this one trait (plus streaming the payload bytes instead of a local
  * temp file).
  */
trait CommitPrimitive {

  /** Atomically publish `content` at `dest` iff `dest` does not exist.
    * @return true — this writer won the version; false — a concurrent
    *         committer already published `dest` (caller must re-read the
    *         log and retry on top of the new latest snapshot). */
  def publish(dest: Path, content: String): Boolean
}

object CommitPrimitive {

  /** POSIX strategy: serialize to a temp file in the destination
    * directory, then `link()` it to the version name — `createLink` is
    * atomic create-if-absent at the filesystem level. A plain
    * ATOMIC_MOVE would silently REPLACE an existing version file,
    * letting a concurrent committer's snapshot be lost. */
  object PosixHardLink extends CommitPrimitive {
    override def publish(dest: Path, content: String): Boolean = {
      val tmp = Files.createTempFile(dest.getParent, ".tmp-", ".json")
      try {
        Files.writeString(tmp, content)
        try { Files.createLink(dest, tmp); true }
        catch { case _: FileAlreadyExistsException => false }
      } finally Files.deleteIfExists(tmp)
    }
  }

  // Process-wide active strategy. The sandbox always runs PosixHardLink;
  // specs swap in race-injecting wrappers (scoped to their own table
  // paths, so concurrently running suites are unaffected).
  @volatile private[table] var active: CommitPrimitive = PosixHardLink

  /** Run `body` with `p` as the commit primitive, restoring after. Test
    * seam — see SnapshotTableSpec's commit-race cases. */
  private[graft] def withPrimitive[A](p: CommitPrimitive)(body: => A): A = {
    val prev = active
    active = p
    try body finally active = prev
  }
}
