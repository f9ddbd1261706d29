package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

/** The retrain-and-swap layer shared by every stored index (vector
  * and text): an index FAMILY is a directory whose `_current` file
  * names the ACTIVE index root. Queries resolve the pointer ONCE and
  * read every artifact under that single root — the atomic unit is
  * the whole root, so a reader can never pair one index's artifact
  * with another's (the mixed-index hazard of swapping artifacts
  * independently). The swap is one `ATOMIC_MOVE` over one small file
  * (the [[Snapshots]] pointer discipline one level up); superseded
  * roots stay on disk, fully time-travelable, until their retention
  * lapses.
  */
object IndexPointer {

  /** The family's active index root, if one was ever installed. */
  def current(family: String): Option[String] = {
    val p = Paths.get(s"$family/_current")
    if (Files.exists(p))
      Some(new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim)
    else None
  }

  /** Atomically repoint `family`'s current index to `root`. Readers
    * see the old root or the new root, never anything between. */
  def swapTo(family: String, root: String): Unit = {
    Files.createDirectories(Paths.get(family))
    val tmp = Paths.get(s"$family/_current.tmp")
    Files.write(tmp, root.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, Paths.get(s"$family/_current"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }
}
