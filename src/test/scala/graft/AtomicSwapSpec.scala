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

  test("a reader healing the swap mid-commit does not crash the " +
    "writer: step 3 tolerates its stage already rolled forward") {
    val dir = Files.createTempDirectory("swap").toString
    val primary = s"$dir/state"
    val stage = AtomicSwap.stagePath(primary)
    // the race: writer finished step 2 (primary aside, stage READY)...
    mkDir(primary + "__old", "old.bin")
    mkDir(stage, "new.bin")
    fs.create(new Path(stage, "_SWAP_READY"), true).close()
    // ...then a reader's recover rolls the stage forward itself
    assert(AtomicSwap.recover(fs, primary))
    assert(contents(primary) === Set("new.bin"))
    // the writer resumes at step 3: its rename fails, but the swap is
    // complete — finishSwap must accept it, not kill the query
    AtomicSwap.finishSwap(fs, new Path(primary), new Path(stage))
    assert(contents(primary) === Set("new.bin"))
    // whereas a rename that failed with NO healed swap still throws
    val p2 = s"$dir/state2"
    intercept[IllegalArgumentException] {
      AtomicSwap.finishSwap(fs, new Path(p2),
        new Path(AtomicSwap.stagePath(p2)))
    }
  }

  test("readRecover: a present primary is taken as-is (an in-flight " +
    "commit's stage and old dirs are NOT swept); a missing primary " +
    "heals like recover") {
    val dir = Files.createTempDirectory("swap").toString
    val primary = s"$dir/state"
    // mid-commit shape: primary present (step 3 done), leftovers live
    mkDir(primary, "new.bin")
    mkDir(primary + "__old", "old.bin")
    mkDir(AtomicSwap.stagePath(primary), "next-batch-partial.bin")
    assert(AtomicSwap.readRecover(fs, primary))
    // nothing swept: the writer owns those dirs
    assert(fs.exists(new Path(primary + "__old")))
    assert(fs.exists(new Path(AtomicSwap.stagePath(primary))))
    assert(contents(primary) === Set("new.bin"))
    // missing primary: readRecover heals (stage READY rolls forward)
    val p2 = s"$dir/state2"
    mkDir(AtomicSwap.stagePath(p2), "s.bin")
    fs.create(new Path(AtomicSwap.stagePath(p2), "_SWAP_READY"),
      true).close()
    assert(AtomicSwap.readRecover(fs, p2))
    assert(contents(p2) === Set("s.bin"))
  }
}
