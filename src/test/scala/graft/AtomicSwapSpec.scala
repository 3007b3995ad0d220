package graft

import java.nio.file.Files

import graft.streaming.AtomicSwap
import org.apache.hadoop.fs.Path

/** Crash-point matrix for the stage-and-swap protocol: exactly one
  * complete artifact must survive a crash at ANY point of commit() —
  * the naive delete-then-rename's "no artifact" window (which made a
  * replayed micro-batch rebuild state from one batch, silently
  * dropping all history) must be unreachable. */
class AtomicSwapSpec extends SparkSpec {

  private def fs = new Path("/").getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  private def mkDir(path: String, marker: String): Unit = {
    val out = fs.create(new Path(path, marker), true)
    out.write(marker.getBytes("UTF-8")); out.close()
  }

  private def contents(path: String): Set[String] =
    fs.listStatus(new Path(path)).map(_.getPath.getName).toSet

  test("full commit: stage becomes primary, no leftovers") {
    val dir = Files.createTempDirectory("swap").toString
    val primary = s"$dir/state"
    mkDir(primary, "old.bin")
    mkDir(AtomicSwap.stagePath(primary), "new.bin")
    AtomicSwap.commit(fs, primary, AtomicSwap.stagePath(primary))
    assert(contents(primary) === Set("new.bin"))
    assert(!fs.exists(new Path(primary + "__old")))
    assert(!fs.exists(new Path(AtomicSwap.stagePath(primary))))
    assert(AtomicSwap.recover(fs, primary)) // idempotent no-op
    assert(contents(primary) === Set("new.bin"))
  }

  test("crash between rename-aside and rename-in (stage READY): " +
    "recover rolls the complete stage FORWARD") {
    val dir = Files.createTempDirectory("swap").toString
    val primary = s"$dir/state"
    // emulate commit() dying after step 2: primary moved aside,
    // stage complete and marked, nothing at primary
    mkDir(primary + "__old", "old.bin")
    mkDir(AtomicSwap.stagePath(primary), "new.bin")
    fs.create(new Path(AtomicSwap.stagePath(primary), "_SWAP_READY"),
      true).close()
    assert(AtomicSwap.recover(fs, primary))
    assert(contents(primary) === Set("new.bin"))
    assert(!fs.exists(new Path(primary + "__old")))
  }

  test("crash mid-stage-write (no READY marker): recover rolls the " +
    "previous artifact BACK") {
    val dir = Files.createTempDirectory("swap").toString
    val primary = s"$dir/state"
    mkDir(primary + "__old", "old.bin")
    mkDir(AtomicSwap.stagePath(primary), "partial.bin") // incomplete
    assert(AtomicSwap.recover(fs, primary))
    assert(contents(primary) === Set("old.bin"))
    assert(!fs.exists(new Path(AtomicSwap.stagePath(primary))))
  }

  test("crash after rename-in but before sweep: recover keeps primary " +
    "and sweeps the leftovers") {
    val dir = Files.createTempDirectory("swap").toString
    val primary = s"$dir/state"
    mkDir(primary, "new.bin")
    fs.create(new Path(primary, "_SWAP_READY"), true).close()
    mkDir(primary + "__old", "old.bin")
    assert(AtomicSwap.recover(fs, primary))
    assert(contents(primary) === Set("new.bin"))
    assert(!fs.exists(new Path(primary + "__old")))
  }

  test("nothing ever committed: recover reports false and sweeps a " +
    "dead partial stage") {
    val dir = Files.createTempDirectory("swap").toString
    val primary = s"$dir/state"
    mkDir(AtomicSwap.stagePath(primary), "partial.bin")
    assert(!AtomicSwap.recover(fs, primary))
    assert(!fs.exists(new Path(AtomicSwap.stagePath(primary))))
  }
}
