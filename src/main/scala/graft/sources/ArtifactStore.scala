package graft.sources

import java.io.File

/** Lifecycle for persisted derived artifacts (the IVF-PQ index, the dedup
  * admission index): tmpdir-scoped path keying, build-if-absent, and —
  * the part the first version lacked — a SOURCE SIGNATURE check, so a
  * regenerated fixture can never be served by the previous corpus's
  * artifact. One policy, shared by both index families (they previously
  * duplicated the path/sanitize/_SUCCESS scaffolding verbatim, so a fix
  * here had to be applied twice).
  *
  * Reuse rule: an artifact is valid iff every table directory carries the
  * Spark writer's `_SUCCESS` marker (a crashed partial write rebuilds)
  * AND the `_signature` stamp matches the current source directory's
  * file listing (name, length, mtime of every data file). The signature
  * is metadata-only — no data is read to validate. Builds run in a
  * process-private staging dir and PUBLISH with an atomic directory
  * rename (r10), so the live path never holds a partial artifact: a
  * crash at any point leaves either the previous complete generation or
  * a dead staging dir the next build sweeps, and concurrent builder
  * JVMs can race without corruption (last complete publish wins).
  *
  * Path keying appends a hash of the FULL raw dir string to the
  * sanitized name: the sanitizer alone mapped distinct dirs (`/a/b` vs
  * `/a_b`) to one key, silently sharing an artifact between fixtures.
  */
object ArtifactStore {

  def path(prefix: String, dir: String): String = {
    val tmp = System.getProperty("java.io.tmpdir", "/tmp").stripSuffix("/")
    val safe = dir.replaceAll("[^A-Za-z0-9.]+", "_").stripPrefix("_")
    val key = Integer.toHexString(scala.util.hashing.MurmurHash3.stringHash(dir))
    s"$tmp/graft_${prefix}_${safe}_$key"
  }

  /** Metadata-only fingerprint of the source dir's files (recursive,
    * sorted for determinism). Catches regeneration (mtime/length change),
    * additions, and removals without reading a byte of data. */
  def signature(dir: String): String = {
    def walk(f: File): Seq[File] =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.sortBy(_.getName).flatMap(walk)
      else Seq(f)
    val lines = walk(new File(dir))
      .filterNot(_.getName.startsWith("."))
      .map(f => s"${f.getAbsolutePath}|${f.length()}|${f.lastModified()}")
    val md = java.security.MessageDigest.getInstance("SHA-256")
    lines.foreach(l => md.update((l + "\n").getBytes("UTF-8")))
    md.digest().map("%02x".format(_)).mkString
  }

  private def stampFile(base: String) = new File(s"$base/_signature")

  private def readStamp(base: String): Option[String] = {
    val f = stampFile(base)
    if (f.exists()) scala.util.Try(
      new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8").trim).toOption
    else None
  }

  /** True iff the artifact at `base` is complete and was built from the
    * source dir in its current state. */
  def valid(base: String, dir: String, tables: Seq[String]): Boolean =
    tables.forall(t => new File(s"$base/$t/_SUCCESS").exists()) &&
      readStamp(base).contains(signature(dir))

  /** Per-artifact-path JVM-local build locks: two concurrent consumers
    * of the same invalid artifact (e.g. q77 and q78 in a parallel
    * harness) in ONE JVM must not build twice. Cross-JVM safety comes
    * from the staging-dir publish below, not from this monitor: two
    * processes may both pay a build (wasted work, not corruption), but a
    * half-written artifact is never at the live path, so `valid()` can
    * never admit one. */
  private val buildLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private def lockFor(base: String): Object =
    buildLocks.computeIfAbsent(base, _ => new Object)

  private def deleteRecursively(f: File): Unit = {
    Option(f.listFiles()).toSeq.flatten.foreach(deleteRecursively)
    f.delete(); ()
  }

  /** Reap finished or crashed builders' leftovers next to `base`:
    * retired generations (`.old.`) are always garbage; staging dirs
    * (`.tmp.<pid>.<nonce>`) are garbage only when their builder process
    * is no longer alive — a LIVE foreign builder's staging dir is its
    * private workspace and must be left alone. */
  private def sweepLeftovers(base: String): Unit = {
    val b = new File(base)
    Option(b.getParentFile.listFiles()).toSeq.flatten.foreach { f =>
      val n = f.getName
      if (n.startsWith(b.getName + ".old.")) deleteRecursively(f)
      else if (n.startsWith(b.getName + ".tmp.")) {
        val pid = n.drop(b.getName.length + 5).takeWhile(_ != '.')
        val alive = scala.util.Try(
          ProcessHandle.of(pid.toLong).map[Boolean](_.isAlive).orElse(false)
        ).getOrElse(false)
        if (!alive) deleteRecursively(f)
      }
    }
  }

  /** Build into a process-private STAGING dir and publish with an atomic
    * directory rename — the cross-process hardening: the live path only
    * ever holds a COMPLETE, stamped artifact (or nothing), so a
    * concurrent Verify/Bench JVM can never `valid()` a half-written one,
    * and a crash mid-build leaves only a dead staging dir the next build
    * sweeps. Publish order: stamp staging → retire the old generation
    * (atomic rename aside) → move staging in (atomic rename) → delete
    * the retired dir. If another process publishes in the tiny window
    * between retire and move, its artifact is complete by the same
    * invariant — ours is dropped, theirs kept. */
  private def buildAndStamp(base: String, dir: String)
                           (build: String => Unit): Unit = {
    sweepLeftovers(base)
    val nonce = java.util.UUID.randomUUID().toString.take(8)
    val staging = new File(s"$base.tmp.${ProcessHandle.current().pid()}.$nonce")
    try {
      build(staging.getAbsolutePath)
      java.nio.file.Files.createDirectories(staging.toPath)
      java.nio.file.Files.write(stampFile(staging.getAbsolutePath).toPath,
        (signature(dir) + "\n").getBytes("UTF-8"))
      val target = new File(base)
      val retired = new File(s"$base.old.$nonce")
      if (target.exists())
        try java.nio.file.Files.move(target.toPath, retired.toPath,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        catch {
          // a concurrent publisher retired the old generation between our
          // exists() and move — fine, the path is clear either way
          case _: java.nio.file.NoSuchFileException =>
        }
      try
        java.nio.file.Files.move(staging.toPath, target.toPath,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      catch {
        // a concurrent publisher won the race to the live path; its
        // artifact is complete by the same staging invariant — keep
        // theirs, drop ours
        case _: java.nio.file.FileAlreadyExistsException =>
          deleteRecursively(staging)
        case e: java.nio.file.FileSystemException if target.exists() =>
          deleteRecursively(staging)
      }
      deleteRecursively(retired)
    } catch {
      case t: Throwable => deleteRecursively(staging); throw t
    }
  }

  /** Run `build` unless a valid artifact already exists; stamp the source
    * signature after a successful build. Returns the artifact path.
    * Validity is re-checked UNDER the lock: the loser of a build race
    * sees the winner's stamp and skips its own rebuild. */
  def ensure(prefix: String, dir: String, tables: Seq[String])
            (build: String => Unit): String = {
    val base = path(prefix, dir)
    if (!valid(base, dir, tables)) lockFor(base).synchronized {
      if (!valid(base, dir, tables)) buildAndStamp(base, dir)(build)
    }
    base
  }

  /** Unconditional rebuild + stamp (the explicit build operators q108/
    * q111, whose contract is "train and write NOW"). */
  def rebuild(prefix: String, dir: String, tables: Seq[String])
             (build: String => Unit): String = {
    val base = path(prefix, dir)
    lockFor(base).synchronized { buildAndStamp(base, dir)(build) }
    base
  }
}
