package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

/** The aside-swap protocol shared by every crash-safe overwrite in the
  * repo (single-file source state in [[Io]], the MapCache generation
  * log): write the replacement NEXT TO the live artifact, rename the
  * live one ASIDE (`.old`), rename the replacement in, delete the
  * aside. A plain delete-then-rename swap has a window where NO valid
  * artifact exists — a crash there silently resets the consumer (state
  * replays from zero, a cache reads as empty). Here, at every instant,
  * either the live artifact or the aside is valid: readers resolve
  * through [[resolve]] and writers heal a crashed swap with
  * [[recover]]. Validity is a predicate (plain existence for files,
  * has-generations for the cache log) so the crash-window reasoning
  * lives in exactly one place. Single writer per artifact, as with
  * every swap protocol. */
private[graft] object AtomicSwap {

  def asideOf(live: Path): Path = new Path(live.toString + ".old")

  /** Writer-side heal: restore the aside when a crash left no valid
    * live artifact (crash between rename-aside and rename-in). */
  def recover(fs: FileSystem, live: Path, valid: Path => Boolean,
              recursive: Boolean): Unit = {
    val aside = asideOf(live)
    if (!valid(live) && valid(aside)) {
      fs.delete(live, recursive) // at most an invalid shell
      require(fs.rename(aside, live), s"swap recovery: cannot restore $aside")
    }
  }

  /** Reader-side resolution: the live artifact when valid, else the
    * aside, else None. Read-only — never renames, so readers can race
    * the single writer safely. */
  def resolve(fs: FileSystem, live: Path, valid: Path => Boolean): Option[Path] = {
    val aside = asideOf(live)
    if (valid(live)) Some(live)
    else if (valid(aside)) Some(aside)
    else None
  }

  /** Swap a FULLY-WRITTEN `tmp` in as `live`. Call [[recover]] before
    * writing `tmp`. A stale aside can only coexist with a valid live
    * artifact (crash after rename-in, before delete-aside) — it is
    * collected here before the swap. */
  def swapIn(fs: FileSystem, tmp: Path, live: Path, recursive: Boolean): Unit = {
    val aside = asideOf(live)
    if (fs.exists(aside)) fs.delete(aside, recursive)
    if (fs.exists(live))
      require(fs.rename(live, aside), s"swap: cannot move $live aside")
    require(fs.rename(tmp, live), s"swap: cannot rename $tmp to $live")
    fs.delete(aside, recursive)
  }
}
