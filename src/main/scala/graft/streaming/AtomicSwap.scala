package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}

/** Crash-tolerant stage-and-swap for persisted state artifacts.
  *
  * The naive swap (`delete(primary); rename(stage, primary)`) has a
  * window where a crash leaves NO artifact: the replayed micro-batch
  * then sees `exists=false` and rebuilds state from that batch alone —
  * for a Bloom admission filter that silently drops all history bits
  * (false negatives, the exact contract the layout protects); for an
  * SCD2 table it drops the entire prior interval history.
  *
  * This helper closes the window with a roll-forward/roll-back
  * protocol. `commit` runs:
  *
  *   1. create `stage/_SWAP_READY`        (stage is complete)
  *   2. rename `primary` -> `primary__old` (if primary exists)
  *   3. rename `stage`   -> `primary`
  *   4. delete `primary/_SWAP_READY`, delete `primary__old`
  *
  * `recover` (call before every read of the artifact) heals a crash at
  * any point: primary present -> keep it, sweep leftovers; primary
  * missing but stage carries the READY marker -> roll the complete
  * stage forward; otherwise roll `__old` back. Exactly one complete
  * artifact survives every crash point. Both artifacts here are
  * parquet directories, so the transient `_`-prefixed marker is
  * invisible to readers even if a crash strands it.
  */
object AtomicSwap {

  private val Ready = "_SWAP_READY"

  /** Conventional sibling stage dir for `primary` (never nest the
    * stage inside the primary — the swap renames whole directories). */
  def stagePath(primary: String): String = primary + "__stage"

  private def oldPath(primary: String): String = primary + "__old"

  /** Swap the fully-written `stage` in as `primary`.
    *
    * Tolerates a CONCURRENT healer: a reader calling [[recover]] (or
    * [[readRecover]] finding primary missing) between steps 2 and 3
    * rolls the READY stage forward itself; the writer's own step-3
    * rename then fails with the primary already present and the stage
    * gone — that is a completed swap, not an error. */
  def commit(fs: FileSystem, primary: String, stage: String): Unit = {
    val p = new Path(primary)
    val st = new Path(stage)
    val old = new Path(oldPath(primary))
    fs.create(new Path(st, Ready), true).close()
    if (fs.exists(old)) fs.delete(old, true) // leftover of a healed crash
    if (fs.exists(p))
      require(fs.rename(p, old), s"rename $p -> $old failed")
    finishSwap(fs, p, st)
    fs.delete(new Path(p, Ready), true)
    fs.delete(old, true)
  }

  /** Step 3 with concurrent-heal tolerance (seam for the race spec):
    * a failed rename whose target already exists and whose source is
    * gone means a reader rolled the READY stage forward first — the
    * swap is complete, not failed. */
  private[graft] def finishSwap(fs: FileSystem, p: Path, st: Path): Unit = {
    // rename may return false OR throw (RawLocalFileSystem throws
    // FileNotFoundException when the source vanished) — both resolve
    // the same way: healed swap is success, anything else is fatal
    val ok =
      try fs.rename(st, p)
      catch { case _: java.io.IOException => false }
    if (!ok)
      require(fs.exists(p) && !fs.exists(st), s"rename $st -> $p failed")
  }

  /** Reader-side healing: if `primary` exists it is authoritative and
    * NOTHING is touched (a reader sweeping stage/old mid-commit would
    * race the single writer — see [[commit]]'s step 1-2 window); only
    * a MISSING primary (the crash window between steps 2 and 3, or a
    * never-written artifact) triggers the full [[recover]]. Writers
    * keep using [[recover]] — there is exactly one (the micro-batch
    * executor), so its sweeps never race itself. */
  def readRecover(fs: FileSystem, primary: String): Boolean =
    if (fs.exists(new Path(primary))) true else recover(fs, primary)

  /** Heal an interrupted [[commit]]; returns true iff `primary` exists
    * (and is complete) afterwards. Idempotent — safe to call before
    * every open. */
  def recover(fs: FileSystem, primary: String): Boolean = {
    val p = new Path(primary)
    val st = new Path(stagePath(primary))
    val old = new Path(oldPath(primary))
    if (fs.exists(p)) {
      // Crashed (if at all) after step 3: primary is authoritative.
      fs.delete(new Path(p, Ready), true)
      fs.delete(old, true)
      fs.delete(st, true)
      true
    } else if (fs.exists(new Path(st, Ready))) {
      // Crashed between steps 2 and 3: stage was complete, roll forward.
      require(fs.rename(st, p), s"recover: rename $st -> $p failed")
      fs.delete(new Path(p, Ready), true)
      fs.delete(old, true)
      true
    } else if (fs.exists(old)) {
      // Stage incomplete: roll the previous artifact back.
      fs.delete(st, true)
      require(fs.rename(old, p), s"recover: rename $old -> $p failed")
      true
    } else {
      // Nothing committed yet (first batch); sweep a dead partial stage.
      fs.delete(st, true)
      false
    }
  }
}
