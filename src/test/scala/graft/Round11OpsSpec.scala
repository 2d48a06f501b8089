package graft

import graft.operators.Round11Ops
import org.scalatest.funsuite.AnyFunSuite

class Round11OpsSpec extends AnyFunSuite {
  import TestSpark._

  test("q309: rebuild fires iff the corpus content changed, and re-indexes it") {
    val rows = Round11Ops.q309IndexStaleness(spark, sf).collect()
    assert(rows.length == 3)
    val byPhase = rows.map(r =>
      r.getAs[String]("phase") -> ((r.getAs[Boolean]("rebuilt"), r.getAs[Long]("n_indexed")))).toMap
    val nV1 = Tables.embeddings(spark, sf)
      .filter(s"vec_id < ${Round11Ops.StaleSlice} AND vec_id % 2 = 0").count()
    val nV2 = Tables.embeddings(spark, sf)
      .filter(s"vec_id < ${Round11Ops.StaleSlice}").count()
    assert(byPhase("1_build") == ((true, nV1)))
    assert(byPhase("2_noop") == ((false, nV1)))
    assert(byPhase("3_refresh") == ((true, nV2)))
  }

  test("ArtifactStore: keys are collision-proof and freshness is content-driven") {
    // two corpus dirs with identical basenames must never share an
    // artifact (the round-10 String.hashCode keying could collide)
    val t1 = java.nio.file.Files.createTempDirectory("as-spec-").resolve("corpus")
    val t2 = java.nio.file.Files.createTempDirectory("as-spec-").resolve("corpus")
    java.nio.file.Files.createDirectories(t1)
    java.nio.file.Files.createDirectories(t2)
    def touch(p: java.nio.file.Path, text: String): Unit =
      java.nio.file.Files.write(p, text.getBytes("UTF-8")): Unit
    touch(t1.resolve("documents.parquet"), "aaa")
    touch(t2.resolve("documents.parquet"), "bbbb")
    var builds = 0
    def ensure(d: String) = ml.ArtifactStore.ensure(spark, d, "spec", Seq("documents")) {
      out => java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out)); builds += 1
    }
    val (d1, r1) = ensure(t1.toString)
    val (d2, r2) = ensure(t2.toString)
    assert(d1 != d2, "distinct corpus paths mapped to one artifact dir")
    assert(r1 && r2 && builds == 2)
    // unchanged content: served, not rebuilt
    val (_, r1b) = ensure(t1.toString)
    assert(!r1b && builds == 2)
    // changed content (size change): rebuild fires
    touch(t1.resolve("documents.parquet"), "aaaa-changed")
    val (_, r1c) = ensure(t1.toString)
    assert(r1c && builds == 3)
  }

  test("q310: integer EMD matches a plain-Scala recount of t-closeness") {
    val rows = Round11Ops.q310TCloseness(spark, sf).collect()
    assert(rows.nonEmpty)
    // recount from raw docs
    val docs = Tables.documents(spark, sf)
      .selectExpr("lang", "source",
        "cast(size(filter(split(text, ' '), t -> t != '')) as bigint) as n_tok").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2) / 10))
    val n = docs.length.toLong
    val sources = docs.map(_._2).distinct.sorted
    val m = sources.length.toLong
    val globalBySrc = docs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val far = scala.collection.mutable.Map.empty[String, (Long, Long, Long)]
    docs.groupBy(d => (d._1, d._3)).foreach { case ((lang, _), grp) =>
      val gsz = grp.length.toLong
      val cnt = grp.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      var cum = 0L
      var emdNum = 0L
      sources.foreach { src =>
        cum += cnt.getOrElse(src, 0L) * n - globalBySrc(src) * gsz
        emdNum += math.abs(cum)
      }
      val emdMicro = emdNum * 1000000L / (gsz * n * (m - 1))
      val (g0, r0, d0) = far.getOrElse(lang, (0L, 0L, 0L))
      far(lang) = (g0 + 1,
        r0 + (if (emdMicro > Round11Ops.TCloseMicro) gsz else 0L), d0 + gsz)
    }
    rows.foreach { r =>
      val (gN, atRisk, docsN) = far(r.getAs[String]("lang"))
      assert(r.getAs[Long]("n_groups") == gN)
      assert(r.getAs[Long]("n_at_risk") == atRisk)
      assert(r.getAs[Long]("n_docs") == docsN)
    }
  }

  test("q311: sketch sums match a plain-Scala sign recount; estimate is sane") {
    val rows = Round11Ops.q311AmsJoinSize(spark, sf).collect()
    assert(rows.length == Round11Ops.AmsGroups)
    val li = Tables.lineitem(spark, sf)
      .selectExpr("l_partkey", "l_returnflag = 'R' as r").collect()
      .map(r => (r.getLong(0), r.getBoolean(1)))
    val P = graft.functions.Portable.P
    def sign(i: Int, k: Long): Long = {
      val Seq(c3, c2, c1, c0) = Round11Ops.AmsCoef(i)
      val h = ((((c3 * k) % P + c2) * k % P + c1) * k % P + c0) % P
      1L - 2L * (h % 2L)
    }
    val perGroup = Round11Ops.AmsPerGroup
    val sums = (0 until Round11Ops.AmsGroups).map { g =>
      (0 until perGroup).map { j =>
        val i = g * perGroup + j
        val x = li.map(e => sign(i, e._1)).sum
        val y = li.collect { case (k, true) => sign(i, k) }.sum
        x * y
      }.sum
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("sum_xy") == sums(r.getAs[Long]("group_id").toInt))
    }
    val truth = li.groupBy(_._1).values.map { g =>
      g.length.toLong * g.count(_._2).toLong
    }.sum
    assert(rows.head.getAs[Long]("true_size") == truth)
    assert(rows.head.getAs[Long]("median_est") == sums.sorted.apply(1) / perGroup)
    // the estimator should be within a factor ~3 of truth at the fixtures
    // (median of 3 means of 16; stderr ~ sqrt(F2a*F2b/16))
    val est = rows.head.getAs[Long]("median_est")
    assert(est > 0 && est < truth * 3 && est * 3 > truth,
      s"AMS estimate $est implausibly far from $truth")
  }

  test("q312: ratings match a plain-Scala integer MM recount from raw events") {
    val rows = Round11Ops.q312BradleyTerry(spark, sf).collect()
    assert(rows.nonEmpty)
    // recount pairs: within (user, day), argmax-value type beats argmin
    val ev = Tables.events(spark, sf)
      .selectExpr("user_id", "cast(ts as date) as day", "event_id", "event_type",
        "cast(floor(value * 1000000.0 + 0.5) as bigint) as v").collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getLong(2),
        r.getString(3), r.getLong(4)))
    val pairs = ev.groupBy(e => (e._1, e._2)).values.filter(_.length >= 2).flatMap { g =>
      val hi = g.minBy(e => (-e._5, e._3))
      val lo = g.minBy(e => (e._5, e._3))
      if (hi._5 > lo._5 && hi._4 != lo._4) Some((hi._4, lo._4)) else None
    }.toSeq
    val w = pairs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val types = (w.keys.map(_._1) ++ w.keys.map(_._2)).toSeq.distinct.sorted
    def nij(i: String, j: String) = w.getOrElse((i, j), 0L) + w.getOrElse((j, i), 0L)
    val wins = types.map(i => i -> types.map(j => w.getOrElse((i, j), 0L)).sum).toMap
    val m = types.length.toLong
    var r = types.map(_ => 1000000L)
    (1 to Round11Ops.BtIters).foreach { _ =>
      val raw = types.zipWithIndex.map { case (i, ii) =>
        val denom = types.zipWithIndex.collect {
          case (j, jj) if j != i && nij(i, j) > 0 =>
            nij(i, j) * 1000000000000L / (r(ii) + r(jj))
        }.sum
        wins(i) * 1000000000000L / denom
      }
      val rs = raw.sum
      r = raw.map(x => x * (m * 1000000L) / rs)
    }
    val want = types.zip(r).toMap
    rows.foreach { row =>
      val t = row.getAs[String]("event_type")
      assert(row.getAs[Long]("rating_micro") == want(t), s"rating mismatch for $t")
      assert(row.getAs[Long]("wins") == wins(t))
      assert(row.getAs[Long]("n_played") == types.filter(_ != t).map(nij(t, _)).sum)
    }
  }

  test("spanGrams is a build-once artifact: no cache entries, stable content") {
    spark.catalog.clearCache()
    val g1 = operators.Round9Ops.spanGrams(spark, sf)
    val n1 = g1.count()
    val g2 = operators.Round9Ops.spanGrams(spark, sf)
    assert(g2.count() == n1)
    // the former per-call persist() accumulated cache entries (ADVICE
    // r10); the artifact-backed frame must leave the cache untouched
    assert(spark.sharedState.cacheManager.isEmpty,
      "spanGrams left entries in the block-cache")
  }
}
