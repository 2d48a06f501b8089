package graft

import org.apache.spark.sql.catalyst.optimizer.BuildRight
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, GlobalLimit, LocalRelation, LogicalPlan, OneRowRelation, Window => LWindow}
import org.apache.spark.sql.execution.{GlobalLimitExec, LocalTableScanExec, SparkPlan, TakeOrderedAndProjectExec}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.scalatest.funsuite.AnyFunSuite

/** CI for SCALING.md's own plan rules, over the ENTIRE graded surface:
  * every `SparkEntry.queries` plan is built at sf0.001 (AQE off so the
  * static physical tree is walkable) and checked for the three
  * anti-patterns that do not survive a 100× scale-up —
  *
  *   1. `BroadcastNestedLoopJoin` whose build side is NOT provably
  *      bounded. A build side is statically bounded when every path to a
  *      leaf passes a groupless aggregate (exactly 1 row), a limit /
  *      top-k, or a literal local table (model constants, k centroids) —
  *      the "1-row attach" and "k-row model" shapes that stay O(1) at
  *      100 TB. Anything else (a corpus scan on the build side) fails.
  *   2. `CartesianProduct` — same rule, non-broadcast spelling.
  *   3. a logical `Window` with an EMPTY partitionSpec whose input is not
  *      provably bounded the same way — a global sort + single-partition
  *      funnel over unbounded input.
  *
  * The name allowlists below are the DOCUMENTED exceptions (graded
  * exactness baselines that deliberately pay the quadratic/global cost
  * beside their scale-bounded twins — see SCALING.md); removing an entry
  * makes this spec fail on that query, so the list cannot drift silently.
  * New queries are checked automatically because the loop runs off
  * `SparkEntry.queries` itself.
  */
class PlanInvariantSpec extends AnyFunSuite {
  import TestSpark._

  /** Corpus-proportional BNLJ kept AS THE GRADED EXACTNESS BASELINE next
    * to a scale-bounded twin (SCALING.md "documented baselines"):
    *  - q38/q91 brute-force kNN grid — twins: q39/q67/q148 (IVF), q274
    *  - q115/q147 SemDeDup within-cell pair grids at sf-test cell sizes
    *  - q153 TF-IDF all-pairs cosine — twin: q35 LSH / q274 candidates
    *  - q233/q234/q235/q246 corpus-grid rankers — twin: q274 (IVF+LSH
    *    candidate generation, constant query batch)
    *  - q190 source-pair Jaccard: |sources|² grid, corpus-bounded sets
    *  - q204/q263 retrieval eval vs brute-force truth (graded metrics)
    *  - q234 batch-hard triplet grid — twin: q284 (pool-mined triplets)
    * Round 10 removed q247 (and the former AllowRecallGrading pair
    * q67/q289): their truth grids moved into the one-time
    * [[graft.ml.TruthTables]] build, so their graded plans carry a
    * truth-table SCAN and only domain-bounded builds (measured below).
    * Single source of truth: [[ScaleAudit.ExactnessBaselines]], shared
    * with the empirical linearity audit's exclusion list so "baseline"
    * means the same set everywhere.
    */
  private val AllowBnlj: Set[String] = ScaleAudit.ExactnessBaselines

  /** BNLJ build sides that ARE bounded, but by a closed value domain or a
    * literal filter the static walk cannot prove. Since round 9 these are
    * NOT name-trusted: the "domain-bounded builds are measured" test
    * below executes each query at sf0.01 AND sf0.1 (10× events / docs)
    * and asserts the measured build-side row counts against the bound
    * claimed here — measured values in parentheses:
    *  - q130: per-day DAU aggregate (30 rows at BOTH SFs — |days| domain)
    *  - q225/q226: per-language count tables (≤ 5 rows + 1-row totals)
    *  - q240: every-[[graft.operators.NoveltyOps.GrowthStride]]th doc_id
    *    checkpoint grid — corpus-proportional BY DESIGN (N/50: 10 rows at
    *    sf0.01, 100 at sf0.1); the test verifies the N/stride formula
    *    itself, and production scales the stride (diagnostic query)
    *  - q264: the 16 literal-filtered seed centroids + a 1-row total
    *  - q39: the 16 seed centroids behind a literal filter (both SFs)
    *  - q296: the sources×sources pair-domain anchor (20 rows per side
    *    at BOTH SFs — |sources| domain; the overlap join itself is an
    *    equi-join on fingerprint)
    *  - q247: the 16 literal-filtered seed centroids (twice: corpus
    *    assign + query cell ranking) and the 3-row probe grid — since
    *    round 10 its truth grid is a persisted TruthTables scan
    *  - q289: the [[graft.operators.Round9Ops.HamQueryCap]]-row query
    *    broadcast (SF-invariant literal filter) — since round 10 its
    *    recall truth is a persisted TruthTables scan
    *  - q322: q247's two 16-centroid literal-filtered builds (corpus
    *    assign + query cell ranking); the occupancy/depth/truth joins
    *    are equi-joins and the truth is the persisted TruthTables scan
    *  - q326: the same two 16-centroid builds plus the |BudgetGrid|-row
    *    literal budget table (q247's probe-grid shape)
    *  - q331: the single k-row TRAINED-centroid build (the persisted
    *    HybridIndex centroids parquet, k = 8 at every SF — the corpus
    *    assignment comes persisted, so unlike q322 there is no second
    *    assign-time build; everything else is an equi-join or a
    *    persisted truth scan)
    *  - q310: the |sources|-row global sensitive-distribution anchor
    *    (the EMD needs every group×source cell, absent sources
    *    included — 20 rows per build at BOTH SFs; the per-group counts
    *    join is an equi-join on the quasi tuple)
    */
  private val AllowDomainBoundedBuild: Set[String] = Set(
    "q130_stickiness", "q225_chi2_select", "q226_naive_bayes",
    "q240_growth_curve", "q264_cell_balance", "q39_knn_ivf",
    "q296_source_overlap", "q247_ivf_recall", "q289_hamming_rerank",
    "q310_t_closeness", "q322_multiprobe_adaptive", "q326_budget_curve",
    "q331_multiprobe_trained")

  private val AllowCartesian: Set[String] = Set()

  /** Global (empty-partitionSpec) windows whose input IS bounded, but by
    * a grouping-key domain the static walk cannot see (grouped aggregates
    * over closed domains), or kept as documented exact baselines.
    * NOT name-trusted since round 10: the "global-window inputs are
    * measured at runtime" test below executes every entry at sf0.01 AND
    * sf0.1 and asserts the measured window-input row count against the
    * domain bound claimed here (the AllowDomainBoundedBuild discipline
    * applied to the second allowlist):
    *  - q145 exact global deciles — baseline beside q92/q127/q134
    *  - q180/q265 cumulative take over per-source / per-bucket aggregates
    *  - q187 skyline over the |brand|×|container| grid
    *  - q212 water-filling over |sources| rows
    *  - q254 CDF over the QnBins×|sources| histogram grid
    *  - q256/q259/q260 ROC sweeps over distinct quantized scores
    *  - q272 Kaplan–Meier over distinct event times (|weeks| domain)
    */
  private val AllowGlobalWindow: Set[String] = Set(
    "q145_deciles", "q180_pps_sample", "q187_skyline", "q212_water_filling",
    "q254_quantile_norm", "q256_auc_exact", "q259_roc", "q260_threshold",
    "q265_value_curve", "q272_survival_km")

  /** Statically bounded physical subtree: every leaf-ward path passes a
    * 1-row aggregate, a limit/top-k, or a literal table. */
  private def boundedP(p: SparkPlan): Boolean = p match {
    case a: BaseAggregateExec if a.groupingExpressions.isEmpty => true
    case _: GlobalLimitExec | _: TakeOrderedAndProjectExec | _: LocalTableScanExec => true
    // leaf wrappers that reference another plan: follow the reference —
    // a reused 1-row broadcast and a persisted k-row model table are as
    // bounded as their originals
    case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => boundedP(r.child)
    case m: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
      boundedP(m.relation.cachedPlan)
    case other if other.children.nonEmpty => other.children.forall(boundedP)
    case _ => false
  }

  /** Same notion on the logical plan (windows are checked pre-planning —
    * rank-over-limit compiles to TakeOrderedAndProject and vanishes from
    * the physical tree). */
  private def boundedL(p: LogicalPlan): Boolean = p match {
    case a: Aggregate if a.groupingExpressions.isEmpty => true
    case _: GlobalLimit | _: LocalRelation | _: OneRowRelation => true
    case other if other.children.nonEmpty => other.children.forall(boundedL)
    case _ => false
  }

  /** collectWithSubqueries does NOT descend into an InMemoryRelation's
    * cached plan, so a BNLJ behind a builder-internal persist() was
    * invisible to both the static walk and the runtime measurement
    * (round 10 found q289's pool join hiding exactly this way). This
    * collector recurses through cached plans too. */
  private def deepCollect[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] = {
    val direct = p.collectWithSubqueries { case x if pf.isDefinedAt(x) => pf(x) }
    val cached = p.collectWithSubqueries {
      case m: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
        m.relation.cachedPlan
    }
    direct ++ cached.distinct.flatMap(c => deepCollect(c)(pf))
  }

  private case class Built(name: String, physical: SparkPlan, logical: LogicalPlan)

  // Build every plan once on an AQE-off clone session (shared context);
  // the invariant tests below share the result.
  private lazy val plans: Seq[Built] = {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val df = fn(s2, sf)
      val b = Built(name, df.queryExecution.executedPlan, df.queryExecution.optimizedPlan)
      s2.catalog.clearCache() // builders may persist() internally
      b
    }
  }

  private def offenders(pred: Built => Boolean, allow: Set[String]): Seq[String] =
    plans.filter(pred).map(_.name).filterNot(allow)

  test("no unbounded-build BroadcastNestedLoopJoin outside the baseline allowlist") {
    val bad = offenders(
      b => deepCollect(b.physical) {
        case j: BroadcastNestedLoopJoinExec
            if !boundedP(if (j.buildSide == BuildRight) j.right else j.left) => j
      }.nonEmpty,
      AllowBnlj ++ AllowDomainBoundedBuild)
    assert(bad.isEmpty, s"undocumented BroadcastNestedLoopJoin in: ${bad.mkString(", ")}")
  }

  /** Execute a query fully (AQE off) and read the measured row count of
    * every BNLJ build side from the BroadcastExchange's numOutputRows
    * metric — the runtime ground truth behind AllowDomainBoundedBuild. */
  private def measuredBuildRows(name: String, sfDir: String): Seq[Long] = {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    val df = SparkEntry.queries(name)(s2, sfDir)
    df.queryExecution.toRdd.count() // run THIS plan so its metrics populate
    val rows = deepCollect(df.queryExecution.executedPlan) {
      case j: BroadcastNestedLoopJoinExec =>
        def r(x: SparkPlan): Long = x match {
          case e: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec =>
            e.metrics("numOutputRows").value
          case re: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => r(re.child)
          // codegen wrappers (InputAdapter, WholeStageCodegen): descend
          case other if other.children.size == 1 => r(other.children.head)
          case other => other.metrics.get("numOutputRows").map(_.value).getOrElse(-1L)
        }
        r(if (j.buildSide == BuildRight) j.right else j.left)
    }
    s2.catalog.clearCache()
    rows.sorted
  }

  test("domain-bounded BNLJ builds are measured at runtime, not name-trusted") {
    // each AllowDomainBoundedBuild entry runs fully at sf0.01 AND sf0.1
    // (10× events / docs) and its measured build-side row counts must
    // satisfy the bound its allowlist comment claims — a build that
    // starts scaling with the corpus fails here even though the static
    // walk can't see it
    val sfA = "/root/testdata/sf0.01"
    val sfB = "/root/testdata/sf0.1"
    def docsN(dir: String): Long = Tables.documents(spark, dir).count()
    val checks: Map[String, (Seq[Long], Seq[Long]) => Option[String]] = Map(
      // per-day DAU aggregate: |days| domain — SF-invariant
      "q130_stickiness" -> ((a, b) =>
        if (a == b && a.forall(_ <= 60)) None
        else Some(s"expected equal day-domain builds <= 60, got $a vs $b")),
      // per-language tables (+ 1-row totals): |langs| domain
      "q225_chi2_select" -> ((a, b) =>
        if ((a ++ b).forall(_ <= 8)) None
        else Some(s"expected lang-domain builds <= 8, got $a vs $b")),
      "q226_naive_bayes" -> ((a, b) =>
        if ((a ++ b).forall(_ <= 8)) None
        else Some(s"expected lang-domain builds <= 8, got $a vs $b")),
      // checkpoint grid: N/stride at EACH SF — the formula is the bound
      "q240_growth_curve" -> ((a, b) => {
        val ea = docsN(sfA) / graft.operators.NoveltyOps.GrowthStride
        val eb = docsN(sfB) / graft.operators.NoveltyOps.GrowthStride
        if (a.forall(r => (r - ea).abs <= 1) && b.forall(r => (r - eb).abs <= 1)) None
        else Some(s"expected N/stride builds (~$ea / ~$eb), got $a vs $b")
      }),
      // 16 literal-filtered seed centroids + a 1-row total — SF-invariant
      "q264_cell_balance" -> ((a, b) =>
        if (a == Seq(1L, 16L) && b == Seq(1L, 16L)) None
        else Some(s"expected [1, 16] seed builds, got $a vs $b")),
      // 16 seed centroids behind a literal filter — SF-invariant
      "q39_knn_ivf" -> ((a, b) =>
        if (a == Seq(16L) && b == Seq(16L)) None
        else Some(s"expected [16] seed build, got $a vs $b")),
      // sources×sources pair-domain anchor: |sources| domain — SF-invariant
      // (the fixture has 20 sources at every SF; equality across SFs is
      // the bound that matters, the constant just names the domain size)
      "q296_source_overlap" -> ((a, b) =>
        if (a == b && (a ++ b).forall(_ <= 32)) None
        else Some(s"expected equal source-domain builds <= 32, got $a vs $b")),
      // 16 seed centroids (×2 joins) + the 3-row probe grid — SF-invariant;
      // the corpus-sized truth grid is GONE (persisted TruthTables scan)
      "q247_ivf_recall" -> ((a, b) =>
        if (a == b && (a ++ b).forall(_ <= 16)) None
        else Some(s"expected equal seed/probe builds <= 16, got $a vs $b")),
      // the constant 8-query broadcast — SF-invariant literal filter;
      // the q38 truth grid is GONE (persisted TruthTables scan)
      "q289_hamming_rerank" -> ((a, b) =>
        if (a == Seq(8L) && b == Seq(8L)) None
        else Some(s"expected [8] query-batch build, got $a vs $b")),
      // |sources|-row global-distribution anchor (+ the 1-row totals
      // build): source-domain — SF-invariant (20 sources at every SF)
      "q310_t_closeness" -> ((a, b) =>
        if (a == b && (a ++ b).forall(_ <= 32)) None
        else Some(s"expected equal source-domain builds <= 32, got $a vs $b")),
      // q247's seed-centroid builds again (×2) — SF-invariant; everything
      // else in the adaptive probe is an equi-join or a persisted scan
      "q322_multiprobe_adaptive" -> ((a, b) =>
        if (a == b && (a ++ b).forall(_ <= 16)) None
        else Some(s"expected equal seed builds <= 16, got $a vs $b")),
      // the seed builds plus the literal budget grid — SF-invariant
      "q326_budget_curve" -> ((a, b) =>
        if (a == b && (a ++ b).forall(_ <= 16)) None
        else Some(s"expected equal seed/grid builds <= 16, got $a vs $b")),
      // the k-row trained-centroid parquet build — k = 8 at every SF
      "q331_multiprobe_trained" -> ((a, b) =>
        if (a == Seq(8L) && b == Seq(8L)) None
        else Some(s"expected [8] trained-centroid build, got $a vs $b")))
    // the checked map and the allowlist must be the SAME set — an entry
    // added to one without the other fails here, so the allowlist can
    // never drift back to name-trust
    assert(checks.keySet == AllowDomainBoundedBuild,
      s"runtime checks out of sync with AllowDomainBoundedBuild: " +
        s"unchecked=${(AllowDomainBoundedBuild -- checks.keySet).mkString(", ")} " +
        s"stale=${(checks.keySet -- AllowDomainBoundedBuild).mkString(", ")}")
    val failures = checks.toSeq.sortBy(_._1).flatMap { case (name, check) =>
      check(measuredBuildRows(name, sfA), measuredBuildRows(name, sfB)).map(m => s"$name: $m")
    }
    assert(failures.isEmpty, s"build-bound violations:\n  ${failures.mkString("\n  ")}")
  }

  /** Execute a query fully (AQE off) and measure the INPUT row count of
    * every global (empty-partitionSpec) window in its physical plan:
    * walk from each WindowExec's child down the single-child chain to
    * the first node exposing a row-count metric — a global window sits
    * above its single-partition exchange (shuffleRecordsWritten), and
    * filters/aggregates in between expose numOutputRows. The runtime
    * ground truth behind AllowGlobalWindow, mirroring the BNLJ
    * measurement above (round-9 advice item #2). */
  private def measuredGlobalWindowRows(name: String, sfDir: String): Seq[Long] = {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    val df = SparkEntry.queries(name)(s2, sfDir)
    df.queryExecution.toRdd.count() // run THIS plan so its metrics populate
    def inputRows(x: SparkPlan): Long = x match {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
        e.metrics.get("shuffleRecordsWritten").map(_.value)
          .orElse(e.metrics.get("numOutputRows").map(_.value)).getOrElse(-1L)
      case re: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        inputRows(re.child)
      case other if other.metrics.contains("numOutputRows") =>
        other.metrics("numOutputRows").value
      case other if other.children.size == 1 => inputRows(other.children.head)
      case _ => -1L
    }
    val rows = deepCollect(df.queryExecution.executedPlan) {
      case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => inputRows(w.child)
    }
    s2.catalog.clearCache()
    rows.sorted
  }

  test("global-window inputs are measured at runtime, not name-trusted") {
    // each AllowGlobalWindow entry runs fully at sf0.01 AND sf0.1 and
    // its measured global-window input row counts must satisfy the
    // domain bound its allowlist comment claims — a window input that
    // starts scaling with the corpus fails here even though the static
    // walk can't see it (the BNLJ-measurement discipline, applied to
    // the second allowlist)
    val sfA = "/root/testdata/sf0.01"
    val sfB = "/root/testdata/sf0.1"
    def ordersN(dir: String): Long = Tables.orders(spark, dir).count()
    def ppsBuckets(dir: String): Long = Tables.documents(spark, dir)
      .select(org.apache.spark.sql.functions.expr("doc_id div 256")).distinct().count()
    def priceFloors(dir: String): Long = Tables.part(spark, dir)
      .select(org.apache.spark.sql.functions.expr("floor(p_retailprice)"))
      .distinct().count()
    // the encoder's closed value space: distinct (n, Σy) per-category
    // stat pairs bound the distinct smoothed scores from above
    def encoderPairs(dir: String): Long = {
      import org.apache.spark.sql.functions._
      Tables.orders(spark, dir)
        .select(col("o_custkey").as("cat"),
          (col("o_orderpriority") === "1-URGENT").cast("long").as("y"))
        .groupBy(col("cat"))
        .agg(count(lit(1)).as("n"), sum(col("y")).as("ss"))
        .select(col("n"), col("ss")).distinct().count()
    }
    val checks: Map[String, (Seq[Long], Seq[Long]) => Option[String]] = Map(
      // exact global deciles: corpus-proportional BY DESIGN (documented
      // exactness baseline beside q127/q134) — the formula IS the claim
      "q145_deciles" -> ((a, b) =>
        if (a == Seq(ordersN(sfA)) && b == Seq(ordersN(sfB))) None
        else Some(s"expected [|orders|] baseline inputs, got $a vs $b")),
      // two-phase prefix sum: the only ordered window runs over the
      // BUCKET relation, |docs|/256 rows
      "q180_pps_sample" -> ((a, b) =>
        if (a == Seq(ppsBuckets(sfA)) && b == Seq(ppsBuckets(sfB))) None
        else Some(s"expected [docs/256] bucket inputs " +
          s"(${ppsBuckets(sfA)} / ${ppsBuckets(sfB)}), got $a vs $b")),
      // skyline prefix-min over ⌊price⌋ buckets: the price-domain width
      // (~900..2100) caps it whatever the corpus
      "q187_skyline" -> ((a, b) =>
        if (a == Seq(priceFloors(sfA)) && b == Seq(priceFloors(sfB)) &&
          (a ++ b).forall(_ <= 1300)) None
        else Some(s"expected [distinct ⌊price⌋] <= 1300, got $a vs $b")),
      // water filling: both ordered windows run over the |sources| caps
      // relation (and its unfunded subset)
      "q212_water_filling" -> ((a, b) =>
        if ((a ++ b).forall(_ <= 32) && a.size == b.size) None
        else Some(s"expected source-domain inputs <= 32, got $a vs $b")),
      // global CDF over the QnBins histogram grid
      "q254_quantile_norm" -> ((a, b) =>
        if ((a ++ b).forall(_ <= operators.MartOps.QnBins)) None
        else Some(s"expected <= ${operators.MartOps.QnBins} bin inputs, got $a vs $b")),
      // rank-sum / ROC / threshold sweeps: the cumulative windows run
      // over DISTINCT encoder scores, bounded by the closed (n, Σy)
      // value space — and far below the row count
      "q256_auc_exact" -> ((a, b) =>
        if (a.forall(_ <= encoderPairs(sfA)) && b.forall(_ <= encoderPairs(sfB)) &&
          b.forall(_ <= ordersN(sfB) / 10)) None
        else Some(s"expected score-domain inputs <= (n,Σy) pairs " +
          s"(${encoderPairs(sfA)} / ${encoderPairs(sfB)}), got $a vs $b")),
      "q259_roc" -> ((a, b) =>
        if (a.forall(_ <= encoderPairs(sfA)) && b.forall(_ <= encoderPairs(sfB)) &&
          b.forall(_ <= ordersN(sfB) / 10)) None
        else Some(s"expected score-domain inputs, got $a vs $b")),
      "q260_threshold" -> ((a, b) =>
        if (a.forall(_ <= encoderPairs(sfA)) && b.forall(_ <= encoderPairs(sfB)) &&
          b.forall(_ <= ordersN(sfB) / 10)) None
        else Some(s"expected score-domain inputs, got $a vs $b")),
      // cumulative take over the CurveBands band table
      "q265_value_curve" -> ((a, b) =>
        if ((a ++ b).forall(_ <= operators.CurveOps.CurveBands)) None
        else Some(s"expected <= ${operators.CurveOps.CurveBands} band inputs, got $a vs $b")),
      // Kaplan–Meier over distinct elapsed-day values: calendar-bounded
      "q272_survival_km" -> ((a, b) =>
        if ((a ++ b).forall(_ <= 120)) None
        else Some(s"expected day-domain inputs <= 120, got $a vs $b")))
    // the checked map and the allowlist must be the SAME set (the
    // AllowDomainBoundedBuild discipline) — no silent name-trust
    assert(checks.keySet == AllowGlobalWindow,
      s"runtime checks out of sync with AllowGlobalWindow: " +
        s"unchecked=${(AllowGlobalWindow -- checks.keySet).mkString(", ")} " +
        s"stale=${(checks.keySet -- AllowGlobalWindow).mkString(", ")}")
    val failures = checks.toSeq.sortBy(_._1).flatMap { case (name, check) =>
      val (a, b) = (measuredGlobalWindowRows(name, sfA), measuredGlobalWindowRows(name, sfB))
      // a -1 means the walk could not find a metric-bearing node — that
      // is a measurement failure, never a pass
      val resolved = if ((a ++ b).contains(-1L))
        Some(s"unresolvable window-input metric: $a vs $b") else check(a, b)
      resolved.map(m => s"$name: $m")
    }
    assert(failures.isEmpty, s"window-bound violations:\n  ${failures.mkString("\n  ")}")
  }

  test("no unbounded CartesianProduct outside the baseline allowlist") {
    val bad = offenders(
      b => deepCollect(b.physical) {
        case j: CartesianProductExec if !boundedP(j.left) && !boundedP(j.right) => j
      }.nonEmpty,
      AllowCartesian)
    assert(bad.isEmpty, s"undocumented CartesianProduct in: ${bad.mkString(", ")}")
  }

  test("no global-window over unbounded input outside the bounded-domain allowlist") {
    val bad = offenders(
      b => b.logical.collectWithSubqueries {
        case w: LWindow if w.partitionSpec.isEmpty && !boundedL(w.child) => w
      }.nonEmpty ||
        // the logical tree ends at InMemoryRelation for builder-persisted
        // fragments, so also walk every cached PHYSICAL plan (the q289
        // BNLJ blind spot, applied to windows); rank-over-limit compiles
        // to TakeOrderedAndProject, so a physical WindowExec with an
        // empty partitionSpec is always a genuine global window
        deepCollect(b.physical) {
          case w: org.apache.spark.sql.execution.window.WindowExec
              if w.partitionSpec.isEmpty && !boundedP(w.child) => w
        }.nonEmpty,
      AllowGlobalWindow)
    assert(bad.isEmpty, s"undocumented global Window in: ${bad.mkString(", ")}")
  }

  test("allowlists contain no stale names (every entry still a live query)") {
    val live = SparkEntry.queries.keySet
    val stale = (AllowBnlj ++ AllowDomainBoundedBuild ++
      AllowCartesian ++ AllowGlobalWindow) -- live
    assert(stale.isEmpty, s"allowlisted but not registered: ${stale.mkString(", ")}")
  }

  test("q274 (the scale-bounded hybrid twin) is clean under ALL invariants") {
    val b = plans.find(_.name == "q274_hybrid_ivf_lsh").get
    assert(b.physical.collectWithSubqueries {
      case j: BroadcastNestedLoopJoinExec => j
      case j: CartesianProductExec => j
    }.isEmpty, "q274 must not contain any nested-loop/cartesian join at all")
    assert(b.logical.collectWithSubqueries {
      case w: LWindow if w.partitionSpec.isEmpty => w
    }.isEmpty, "q274 must not contain any global window")
  }
}
