package graft.tools

/** Second-JVM half of the ArtifactStore cross-process race test
  * (SerdePartitioningSpec): loops `rebuild` on a two-table artifact,
  * stamping BOTH tables with the same per-iteration marker. The test
  * JVM runs the identical loop concurrently; the staging-publish
  * invariant says whichever generation survives must carry ONE marker
  * in both tables — direct-to-live writes would interleave them.
  * Depends only on scala-library (no Spark), so the spawning test can
  * build its classpath from the compiled classes dir alone.
  */
object ArtifactRaceHelper {

  def buildOnce(src: String, marker: String): Unit = {
    graft.sources.ArtifactStore.rebuild("racepfx", src, Seq("t1", "t2")) { base =>
      for (t <- Seq("t1", "t2")) {
        val d = new java.io.File(s"$base/$t"); d.mkdirs()
        java.nio.file.Files.write(
          new java.io.File(d, "_SUCCESS").toPath, Array.empty[Byte])
        // widen the interleave window between the two table writes
        if (t == "t1") Thread.sleep(1)
        java.nio.file.Files.write(
          new java.io.File(d, "payload").toPath, marker.getBytes("UTF-8"))
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val iters = args(1).toInt
    val me = ProcessHandle.current().pid()
    (1 to iters).foreach(i => buildOnce(src, s"$me-$i"))
  }
}
