package graft.engine

import java.nio.file.{Files, Path}
import java.util.Comparator
import java.util.concurrent.ConcurrentHashMap

/** Build-once memo for temp-directory artifacts (persisted indexes)
  * reused across same-JVM query runs — Verify/Bench execute every
  * query in one process, mirroring how a served index is built once
  * and queried many times. The KEY is the caller's statement of
  * artifact identity; rebuilding when the data under a key changes is
  * the caller's responsibility, exactly as for any persisted index. A
  * production deployment passes a real warehouse path to the builder
  * directly and owns its lifecycle; these directories are removed on
  * JVM exit.
  */
object TempArtifacts {
  private val built = new ConcurrentHashMap[String, String]()

  def getOrBuild(key: String, prefix: String)(build: String => Unit): String =
    built.computeIfAbsent(key, _ => {
      val dir = Files.createTempDirectory(prefix)
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        try Files.walk(dir).sorted(Comparator.reverseOrder[Path]())
          .forEach(p => Files.deleteIfExists(p))
        catch { case _: Exception => () } // best-effort temp cleanup
      }))
      build(dir.toString)
      dir.toString
    })
}
