package graft.sources.snapshot

import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** The commit primitive of the snapshot log, extracted behind a seam.
  *
  * Everything [[SnapshotLog]] publishes — version manifests, constraint
  * sidecars, tag files — goes through ONE operation: "make these bytes
  * visible at this path iff nothing is visible there yet, atomically,
  * with exactly one winner among racers". That primitive is what makes
  * commits serializable and history linear; everything else (data
  * files, temp files) is ordinary immutable-blob I/O.
  *
  * The right implementation differs per storage system:
  *
  *  - '''HDFS''' (and ABFS/GCS connectors with atomic rename):
  *    write-temp + rename, because `FileSystem.rename` REFUSES an
  *    existing destination by the HDFS contract — [[HdfsRenameLogStore]].
  *  - '''Local filesystem''': rename(2) silently REPLACES an existing
  *    destination, so exists-then-rename admits two winners
  *    microseconds apart (observed: an 8-way tag race lost a publish).
  *    The CAS is a hard LINK instead — atomic and exclusive by POSIX —
  *    [[LocalLinkLogStore]].
  *  - '''Object stores without atomic rename''' (S3 and shims whose
  *    rename is copy+delete and overwrites): NEITHER primitive is safe;
  *    the store must offer a conditional put (S3 `If-None-Match: *`,
  *    GCS `ifGenerationMatch=0`, a DynamoDB/Zookeeper claim table —
  *    the Delta-on-S3 LogStore design). [[ConditionalPutLogStore]] is
  *    that contract's shape with an in-process claim table standing in
  *    for the service-side precondition, so the commit protocol is
  *    TESTED against conditional-put semantics even though this repo
  *    can't talk to a real object store. A deployment fills this seam
  *    with a store whose `claim` is the real conditional write.
  *
  * Reads and listings of published objects are plain filesystem
  * operations in all bundled stores (published log objects are
  * immutable, so no read-side coordination is needed), but they route
  * through the trait so a store backed by something other than a
  * Hadoop FileSystem (a database log table, a commit service) can
  * implement the whole log plane.
  *
  * Selection: `spark.graft.snapshot.logstore` — `auto` (default: hard
  * link on `file://`, rename elsewhere), `hdfs-rename`, `local-link`,
  * `conditional-put`, or any name registered via [[LogStore.register]].
  */
trait LogStore {

  /** Publish `bytes` at `dest` iff nothing is published there.
    * Atomic: concurrent calls for the same `dest` see EXACTLY ONE
    * winner; losers return false having changed nothing visible.
    * Returns true iff this call published.
    */
  def publishExclusive(fs: FileSystem, dest: Path, bytes: Array[Byte]): Boolean

  /** Read a published log object whole. */
  def read(fs: FileSystem, p: Path): Array[Byte]

  /** List published log objects matching a glob pattern. */
  def list(fs: FileSystem, pattern: Path): Seq[FileStatus]
}

/** FS-backed read/list plus the shared write-temp helper. */
abstract class HadoopBackedLogStore extends LogStore {

  override def read(fs: FileSystem, p: Path): Array[Byte] = {
    val in = fs.open(p)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](8192)
      var n = in.read(tmp)
      while (n >= 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
      buf.toByteArray
    } finally in.close()
  }

  override def list(fs: FileSystem, pattern: Path): Seq[FileStatus] =
    Option(fs.globStatus(pattern)).map(_.toSeq).getOrElse(Nil)

  /** Land `bytes` in a fresh uniquely-named sibling of `dest` — never
    * visible to readers (log listings match exact name shapes).
    */
  protected def writeTemp(fs: FileSystem, dest: Path,
      bytes: Array[Byte]): Path = {
    val tmp = new Path(dest.getParent,
      dest.getName + ".tmp-" + java.util.UUID.randomUUID().toString)
    val out = fs.create(tmp, false)
    try out.write(bytes) finally out.close()
    tmp
  }

  /** Test seam: runs between landing the temp bytes and the exclusive
    * publish attempt — the check-to-act window a racing publisher can
    * land in. Production stores leave it empty; specs override it to
    * inject a deterministic lost-publish race.
    */
  protected def beforePublish(fs: FileSystem, dest: Path): Unit = ()
}

/** Write-temp + `FileSystem.rename`. SAFETY CONTRACT: relies on rename
  * refusing an existing destination — true on HDFS (and connectors
  * honoring the HDFS rename contract), FALSE on the local filesystem
  * and on object-store shims whose rename overwrites (s3a copy+delete).
  * On those, two racers both "succeed" and one publish is silently
  * lost — use [[LocalLinkLogStore]] / [[ConditionalPutLogStore]]. The
  * `exists` pre-check is only a fast path; exclusion comes from the
  * rename contract itself.
  */
class HdfsRenameLogStore extends HadoopBackedLogStore {
  override def publishExclusive(fs: FileSystem, dest: Path,
      bytes: Array[Byte]): Boolean = {
    val tmp = writeTemp(fs, dest, bytes)
    if (fs.exists(dest)) { fs.delete(tmp, false); false }
    else {
      // the check-to-act window: on HDFS the rename below refuses an
      // existing destination, so a racer publishing here makes the
      // rename fail (safe); on an overwriting-rename FS it is LOST
      beforePublish(fs, dest)
      if (fs.rename(tmp, dest)) true
      else { fs.delete(tmp, false); false }
    }
  }
}

/** Write-temp + hard link: `link(2)` fails with EEXIST if the
  * destination exists — atomic and exclusive by POSIX, immune to the
  * local rename-overwrites hazard. Local (`file://`) paths only.
  */
class LocalLinkLogStore extends HadoopBackedLogStore {
  override def publishExclusive(fs: FileSystem, dest: Path,
      bytes: Array[Byte]): Boolean = {
    // same POSIX-only contract as FileClaimLogStore.claim: a java.nio
    // link against a non-local FileSystem would miss its targets and
    // read as a permanent lost race instead of a configuration error
    val scheme = fs.getUri.getScheme
    require(scheme == "file",
      "local-link publishes are POSIX hard links on a LOCAL filesystem; " +
        s"it cannot serve scheme '$scheme' — select hdfs-rename " +
        "or a conditional-put store instead")
    val tmp = writeTemp(fs, dest, bytes)
    beforePublish(fs, dest)
    try {
      java.nio.file.Files.createLink(
        java.nio.file.Paths.get(dest.toUri.getPath),
        java.nio.file.Paths.get(tmp.toUri.getPath))
      fs.delete(tmp, false)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        fs.delete(tmp, false); false
      case _: java.nio.file.NoSuchFileException =>
        fs.delete(tmp, false); false
    }
  }
}

/** The conditional-put contract: a CLAIM decides the winner atomically
  * BEFORE any visible write, so the publish itself cannot race — the
  * shape of S3 `PutObject If-None-Match: *` / GCS `ifGenerationMatch=0`
  * / an external claim table (the Delta-on-S3 LogStore design).
  *
  * The claim is a SHORT-LIVED lock, not the durable decided-state:
  * whoever wins it checks the destination, writes (or doesn't), and
  * RELEASES it — always, success or failure — so the durable
  * "already published" signal is the destination object itself. This
  * keeps the claim table bounded (only in-flight publishes hold
  * entries), lets a destination be re-published after deletion
  * (delete-tag → create-tag of the same name), and never bricks a
  * destination when a publish fails after winning its claim.
  *
  * Here [[claim]] is an in-process `putIfAbsent` keyed by the
  * qualified destination URI; [[FileClaimLogStore]] swaps it for a
  * hard-link CAS on a sibling `.claim` path (cross-PROCESS exclusion
  * on any shared POSIX filesystem); a production store overrides the
  * pair with the service-side primitive (DynamoDB conditional write,
  * a lock service) — or overrides [[publishExclusive]] wholesale when
  * the store's PUT is itself conditional — and inherits the protocol
  * the specs pin.
  *
  * Losers never touch the destination — no temp-file promotion step
  * exists to race on.
  */
class ConditionalPutLogStore extends HadoopBackedLogStore {

  /** Claim `dest`: true iff this caller now owns the right to decide
    * it. Override with a real conditional-write primitive in
    * deployments; pair with [[release]].
    */
  protected def claim(fs: FileSystem, dest: Path): Boolean =
    ConditionalPutLogStore.claims.putIfAbsent(
      fs.makeQualified(dest).toUri.toString, java.lang.Boolean.TRUE) == null

  /** Release a won claim — called exactly once per won claim, after
    * the publish attempt resolved either way.
    */
  protected def release(fs: FileSystem, dest: Path): Unit = {
    ConditionalPutLogStore.claims.remove(
      fs.makeQualified(dest).toUri.toString)
    ()
  }

  override def publishExclusive(fs: FileSystem, dest: Path,
      bytes: Array[Byte]): Boolean = {
    beforePublish(fs, dest)
    if (!claim(fs, dest)) false
    else {
      try {
        if (fs.exists(dest)) false // decided by an earlier publish
        else {
          // sole claimant — but a filesystem write is not
          // visibility-atomic the way a real conditional PUT is (the
          // object appears whole or not at all), so land the bytes via
          // temp + rename: a concurrent lister must never open a
          // half-written log object. Plain rename is safe HERE because
          // the claim guarantees no competitor writes this destination.
          val tmp = writeTemp(fs, dest, bytes)
          if (fs.rename(tmp, dest)) true
          else { fs.delete(tmp, false); false }
        }
      } finally release(fs, dest)
    }
  }
}

object ConditionalPutLogStore {
  /** Process-wide claim table — the test stand-in for the service-side
    * conditional-write precondition. Bounded: entries live only while
    * a publish is in flight ([[ConditionalPutLogStore.release]]).
    */
  private[graft] val claims = new ConcurrentHashMap[String, java.lang.Boolean]()
}

/** Conditional-put whose claim is ITSELF a filesystem CAS: a hard link
  * landing a sibling `<dest-name>.claim` file — atomic and exclusive
  * by POSIX `link(2)`, across THREADS, CLASSLOADERS, and PROCESSES
  * sharing the filesystem, where the in-process claim table of
  * [[ConditionalPutLogStore]] can only exclude within one JVM. This is
  * the reference impl of "claim table on the FS" a deployment can run
  * on NFS/local disk today, and the protocol twin of a DynamoDB claim
  * row for S3.
  *
  * Claim files are invisible to the log plane (listings match exact
  * `*.json` name shapes) and are removed on release. A writer that
  * CRASHES between claim and release leaves a stale `.claim` blocking
  * that one destination — the same stuck-lock trade every external
  * claim table has; an operator (or a TTL sweep) removes it. Crash
  * AFTER the rename lands is harmless: the destination exists, so the
  * stale claim blocks nobody from reading and the next claimant's
  * exists-check resolves to "already decided".
  */
class FileClaimLogStore extends ConditionalPutLogStore {

  private def claimPath(dest: Path) =
    new Path(dest.getParent, dest.getName + ".claim")

  override protected def claim(fs: FileSystem, dest: Path): Boolean = {
    // the claim is a java.nio hard link — meaningful ONLY on a local
    // POSIX path. Against any other FileSystem the link targets would
    // not exist locally and every claim would return false, surfacing
    // as a permanent (and misleading) "concurrent commit" failure —
    // refuse with the real problem instead
    val scheme = fs.getUri.getScheme
    require(scheme == "file",
      "conditional-put-file claims are POSIX hard links on a LOCAL " +
        s"filesystem; it cannot serve scheme '$scheme' — use a " +
        "service-side conditional-put store for object storage")
    val cp = claimPath(dest)
    val tmp = writeTemp(fs, cp, Array.emptyByteArray)
    try {
      java.nio.file.Files.createLink(
        java.nio.file.Paths.get(cp.toUri.getPath),
        java.nio.file.Paths.get(tmp.toUri.getPath))
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
      case _: java.nio.file.NoSuchFileException => false
    } finally fs.delete(tmp, false)
  }

  override protected def release(fs: FileSystem, dest: Path): Unit = {
    fs.delete(claimPath(dest), false)
    ()
  }
}

object FileClaimLogStore {

  /** The operator/TTL sweep for the one stuck-lock trade this store
    * makes (see class doc): remove `.claim` files under `dir` older
    * than `ttlMs`. A live claim is milliseconds-to-seconds old (it
    * spans one exists-check + one rename), so any TTL beyond the
    * longest plausible publish — minutes — can only ever free claims
    * whose writer died between claim and release; a swept claim whose
    * destination already exists was blocking nobody's reads anyway.
    * Returns the removed claim paths.
    */
  def sweepStaleClaims(fs: FileSystem, dir: Path, ttlMs: Long): Seq[Path] = {
    val cutoff = System.currentTimeMillis() - ttlMs
    Option(fs.globStatus(new Path(dir, "*.claim")))
      .map(_.toSeq).getOrElse(Nil)
      .filter(_.getModificationTime < cutoff)
      .map(_.getPath)
      .filter(p => fs.delete(p, false))
  }
}

object LogStore {

  /** Session conf selecting the publish primitive (see [[LogStore]]). */
  val ConfKey = "spark.graft.snapshot.logstore"

  private val hdfsRename = new HdfsRenameLogStore
  private val localLink = new LocalLinkLogStore
  private val conditionalPut = new ConditionalPutLogStore
  private val fileClaim = new FileClaimLogStore

  private val registry = new ConcurrentHashMap[String, LogStore]()
  registry.put("hdfs-rename", hdfsRename)
  registry.put("local-link", localLink)
  registry.put("conditional-put", conditionalPut)
  registry.put("conditional-put-file", fileClaim)

  /** Register a custom store under `name` for [[ConfKey]] selection —
    * the deployment hook for a real object-store conditional-put impl.
    */
  def register(name: String, store: LogStore): Unit = registry.put(name, store)

  /** Resolve the active store for `fs` from the session conf; `auto`
    * picks by scheme (hard link locally, rename elsewhere — each safe
    * exactly where its primitive's exclusivity holds).
    */
  def active(fs: FileSystem): LogStore = {
    // active is thread-local; fall back to the default session so the
    // conf resolves from executor-adjacent/helper threads too
    val name = SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession)
      .map(_.conf.get(ConfKey, "auto")).getOrElse("auto")
    if (name == "auto") {
      if (fs.getScheme == "file") localLink else hdfsRename
    } else {
      val s = registry.get(name)
      require(s != null,
        s"$ConfKey '$name' is not registered (have: auto, " +
          registry.keySet().toArray.map(String.valueOf).sorted
            .mkString(", ") + ")")
      s
    }
  }
}
