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

  /** hadoop's `FTPFileSystem.rename` feeds the parent's full URI string
    * to the FTP `CWD` command and ignores its failure (long-standing
    * upstream bug — verified against hadoop-client-api 3.4.2 bytecode:
    * `changeWorkingDirectory(absoluteSrc.getParent().toUri()
    * .toString())`, result popped), so with fully-qualified paths every
    * RFC-959 server rejects the CWD and the rename silently returns
    * false. Passing PATH-ONLY arguments makes its `makeAbsolute`
    * resolve against the connection's working directory instead, which
    * is correct on the single-authority FS instance the caller already
    * holds. Other schemes pass through untouched. */
  private def renameArg(p: Path): Path =
    if ("ftp".equalsIgnoreCase(p.toUri.getScheme)) new Path(p.toUri.getPath) else p

  private def rename(fs: FileSystem, from: Path, to: Path): Boolean =
    fs.rename(renameArg(from), renameArg(to))

  /** Writer-side heal: restore the aside when a crash left no valid
    * live artifact (crash between rename-aside and rename-in). */
  def recover(fs: FileSystem, live: Path, valid: Path => Boolean,
              recursive: Boolean): Unit = {
    val aside = asideOf(live)
    if (!valid(live) && valid(aside)) {
      fs.delete(live, recursive) // at most an invalid shell
      require(rename(fs, aside, live), s"swap recovery: cannot restore $aside")
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
      require(rename(fs, live, aside), s"swap: cannot move $live aside")
    require(rename(fs, tmp, live), s"swap: cannot rename $tmp to $live")
    fs.delete(aside, recursive)
  }
}
