package graft

import java.nio.file.{Files, Paths}

/** Shared temp-file helpers (one implementation — streaming replays,
  * source round trips, and tests all need the same recursive delete). */
object TmpFiles {
  def deleteRecursively(dir: String): Unit = {
    val root = Paths.get(dir)
    if (Files.exists(root)) {
      Files.walk(root).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.deleteIfExists(p))
    }
  }
}
