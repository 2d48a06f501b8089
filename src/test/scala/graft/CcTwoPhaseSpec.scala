package graft

import graft.operators.{GraphOps, TextOps}
import org.scalatest.funsuite.AnyFunSuite

/** q194 (large-star/small-star CC) must produce exactly q55's component
  * labeling — two different distributed algorithms, one fixpoint. */
class CcTwoPhaseSpec extends AnyFunSuite {
  import TestSpark._

  test("q194 labels equal q55's min-label components") {
    val twoPhase = GraphOps.q194CcTwoPhase(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val minLabel = TextOps.q55DupClusters(spark, sf)
      .select("doc_id", "cluster_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(twoPhase == minLabel)
  }

  test("q194: every cluster id is the min doc_id of its cluster") {
    val rows = GraphOps.q194CcTwoPhase(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    rows.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.map(_._1).min == cid,
        s"cluster $cid should be labeled by its min member")
    }
  }
}
