package graft.sources

import org.apache.hadoop.fs.Path

/** Working-directory session state (`hh cd` / `hh pwd` analogue,
  * SURVEY.md §1a): plain JVM state resolving relative paths against the
  * current directory, with `..`/`.` normalization. Purely client-side —
  * the FileSystem API itself is stateless, exactly like the reference's
  * shell-session layer.
  */
final class FsSession(start: String = "/") {
  require(start.startsWith("/"), s"start must be absolute, got '$start'")
  private var cwd: String = normalize(start)

  def pwd: String = cwd

  /** Change directory; relative paths resolve against pwd. Returns the
    * new pwd. No existence check — like the reference, `cd` is pure
    * session state and a later op on a bad path fails there.
    */
  def cd(path: String): String = {
    cwd = resolve(path)
    cwd
  }

  /** Absolute, normalized form of `path` relative to pwd. */
  def resolve(path: String): String =
    if (path.startsWith("/")) normalize(path)
    else normalize(s"$cwd/$path")

  /** Resolve to a Hadoop Path (the handoff into FsOps/queries). */
  def resolvePath(path: String): Path = new Path(resolve(path))

  private def normalize(p: String): String = {
    val out = new scala.collection.mutable.ArrayBuffer[String]
    for (seg <- p.split("/", -1); if seg.nonEmpty && seg != ".")
      if (seg == "..") { if (out.nonEmpty) out.remove(out.length - 1) }
      else out += seg
    "/" + out.mkString("/")
  }
}
