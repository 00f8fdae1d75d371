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

  /** Object-store CAS simulation: conditional PUT with `If-None-Match: *`
    * (S3 since 2024; GCS/ADLS natively via `x-goog-if-generation-match:
    * 0` / `If-None-Match: *`). The winner is decided by an atomic
    * put-if-absent on the store's KEY SPACE — an in-process map standing
    * in for the object store's metadata CAS — and only the winner
    * materializes the payload at `dest`; every loser sees a deterministic
    * false with no partial state, the losing-writer path a concurrent
    * committer rebases from. The decision point needs NO filesystem
    * atomicity (no link(), no rename-without-replace), which is the whole
    * point: S3 offers neither, and this primitive proves the commit
    * protocol above is correct with only a conditional PUT underneath.
    * A `dest` that already exists on disk (published before this
    * primitive was installed) loses like any conditional PUT against an
    * existing object. */
  final class InMemoryCas extends CommitPrimitive {
    private val store = new java.util.concurrent.ConcurrentHashMap[String, String]()
    override def publish(dest: Path, content: String): Boolean = {
      if (Files.exists(dest)) return false
      val won = store.putIfAbsent(dest.toAbsolutePath.toString, content) == null
      if (won) {
        // winner-only materialization: no loser ever touches `dest`
        val tmp = Files.createTempFile(dest.getParent, ".cas-", ".json")
        try {
          Files.writeString(tmp, content)
          Files.move(tmp, dest, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        } finally Files.deleteIfExists(tmp)
      }
      won
    }
  }

  // Per-location override registry. The default everywhere is
  // PosixHardLink; specs register race-injecting wrappers for THEIR OWN
  // table locations only, so every other concurrent commit in the JVM
  // (other tables, concurrently running suites) keeps the production
  // strategy — a process-wide mutable primitive would route them all
  // through the injected mock on nothing but naming convention.
  private val overrides =
    new java.util.concurrent.ConcurrentHashMap[String, CommitPrimitive]()

  /** The primitive governing a commit publishing `dest`: the override
    * registered for the deepest enclosing location, else the POSIX
    * default. */
  private[table] def forDest(dest: Path): CommitPrimitive = {
    val p = dest.toAbsolutePath.toString
    var best: String = null
    overrides.forEach { (loc, _) =>
      // path-boundary match: an override for /wh/db/ev must not capture
      // /wh/db/ev_backup
      val within = p == loc || p.startsWith(loc + java.io.File.separator)
      if (within && (best == null || loc.length > best.length))
        best = loc
    }
    if (best == null) PosixHardLink else overrides.get(best)
  }

  /** Run `body` with `p` as the commit primitive for commits UNDER
    * `location` only, restoring after. Test seam — see
    * SnapshotTableSpec's commit-race cases. */
  private[graft] def withPrimitive[A](location: String, p: CommitPrimitive)(
      body: => A): A = {
    val key = java.nio.file.Paths.get(location).toAbsolutePath.toString
    require(overrides.putIfAbsent(key, p) == null,
      s"commit primitive already overridden for $key")
    try body finally overrides.remove(key)
  }
}
