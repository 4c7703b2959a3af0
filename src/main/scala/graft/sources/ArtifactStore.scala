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
  * is metadata-only — no data is read to validate — and is written LAST,
  * after all tables, so a crash between table writes and the stamp also
  * rebuilds.
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
    * harness) must not interleave their parquet writes. The signature
    * stamp alone is crash-safe but not race-safe. Cross-JVM races are
    * out of scope (the driver runs one JVM; a shared multi-writer store
    * would need a filesystem lease, not a JVM monitor). */
  private val buildLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private def lockFor(base: String): Object =
    buildLocks.computeIfAbsent(base, _ => new Object)

  private def buildAndStamp(base: String, dir: String)
                           (build: String => Unit): Unit = {
    stampFile(base).delete() // invalidate first: crash mid-build rebuilds
    build(base)
    java.nio.file.Files.createDirectories(new File(base).toPath)
    java.nio.file.Files.write(stampFile(base).toPath,
      (signature(dir) + "\n").getBytes("UTF-8"))
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
