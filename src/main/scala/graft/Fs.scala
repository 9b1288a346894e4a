package graft

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

/** Small filesystem helpers. `Files.list`/`Files.walk` return streams
  * backed by an open directory fd that is only released by `close()`;
  * leaking them until GC can exhaust the fd limit in a long-running
  * 10 s-trigger ingest job, so every listing in this codebase goes
  * through here.
  */
object Fs {

  /** Direct children of `dir`, eagerly materialized with the stream
    * closed; empty if `dir` is not a directory.
    */
  def children(dir: Path): Seq[Path] = {
    if (!Files.isDirectory(dir)) return Seq.empty
    val s = Files.list(dir)
    try s.iterator().asScala.toSeq
    finally s.close()
  }

  def deleteRecursively(p: Path): Unit = {
    children(p).foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }
}
