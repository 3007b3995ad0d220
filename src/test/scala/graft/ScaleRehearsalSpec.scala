package graft

import graft.tools.ScaleRehearsal
import java.nio.file.Files

/** The 100-TB claim, tested with data: blow the sf0.001 fixtures up 4×
  * (deterministic copies — fresh ids, jittered vectors, suffixed
  * texts), rebuild the persisted IVF, sign-LSH, near-dup, graph-edge,
  * BM25-postings, SQ8 and IVF-PQ layouts at both scales, and assert
  * from executed-scan metrics that every index probe (and a
  * representative graph hop and keyword-term probe) opens the same
  * O(probed buckets) file count at either scale while the brute-force
  * legs (exact KNN, full LSH pair sweep) scan the whole blown-up
  * corpus — and that the SQ8 coarse scan admits a strict fraction of
  * the float file's bytes at both scales (the quantized family's
  * compression story, measured on disk). The CLI twin
  * (`runMain graft.tools.ScaleRehearsal`) runs the same table at 10×. */
class ScaleRehearsalSpec extends SparkSpec {

  test("index probes stay O(probed buckets) at 4x; brute legs grow") {
    val work = Files.createTempDirectory("graft_rehearsal_spec").toString
    val rows = ScaleRehearsal.run(spark, sf, factor = 4, work)
    info("\n" + ScaleRehearsal.render(rows))
    assert(rows.size === 20, "10 legs x 2 scales")
    val violations = ScaleRehearsal.check(rows, factor = 4)
    assert(violations.isEmpty, violations.mkString("; "))
    // the probes answered, and the blow-up actually scaled the corpus
    assert(rows.forall(_.corpusRows > 0))
    assert(rows.find(r => r.leg == "knn_brute" && r.scale == 4).get
      .corpusRows === rows.find(r => r.leg == "knn_brute" && r.scale == 1)
      .get.corpusRows * 4)
  }
}
