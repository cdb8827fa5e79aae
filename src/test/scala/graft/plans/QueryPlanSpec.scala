package graft.plans

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.execution.{SparkPlan, SortExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
import org.apache.spark.sql.catalyst.plans.physical.SinglePartition

/** Plan-shape regression gate over the ENTIRE query surface.
  *
  * Correctness is pinned per query by the DuckDB oracle; what that gate
  * can NOT see is a plan that silently degrades — a broadcast hint lost
  * in a refactor, a filter that stops reaching the scan, a rank filter
  * that no longer collapses to WindowGroupLimit, a window that quietly
  * becomes single-partition. Each of those keeps producing identical
  * rows at sf0.01 while becoming a scale-killer at the 100-TB design
  * point, so this spec asserts the scale-critical physical-plan
  * properties for every `SparkEntry.queries` entry and fails on drift
  * (Spark upgrade, refactor, optimizer-conf change).
  *
  * Global invariants (all queries):
  *   - no CartesianProduct anywhere;
  *   - BroadcastNestedLoopJoin only where a bounded side is broadcast
  *     by construction (ANN scoring / tf-idf vocab attach);
  *   - no empty-partition (single-partition) Window outside
  *     `Relational.positionalZip` (q15, guarded by contract);
  *   - no Sort directly over a SinglePartition exchange outside q15.
  *
  * Targeted positives (the plans the README/scaladoc promise):
  *   - dim joins broadcast WITH auto-broadcast disabled, proving the
  *     explicit `broadcast()` hints survive (not the 10 MB threshold);
  *   - top-k queries collapse to WindowGroupLimit / TakeOrderedAndProject;
  *   - filter-bearing scans keep non-empty PushedFilters.
  */
class QueryPlanSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  // ---- plan capture (each query built exactly once) --------------------

  private lazy val qe: Map[String, org.apache.spark.sql.execution.QueryExecution] = {
    assume(new java.io.File(s"$sfDir/lineitem.parquet").exists())
    SparkEntry.queries.map { case (name, fn) =>
      name -> fn(spark, sfDir).queryExecution
    }
  }
  private lazy val formatted: Map[String, String] = qe.map { case (n, e) =>
    n -> e.explainString(org.apache.spark.sql.execution.FormattedMode)
  }

  private def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
    case other => other +: other.children.flatMap(flatten)
  }
  private lazy val nodes: Map[String, Seq[SparkPlan]] =
    qe.map { case (n, e) => n -> flatten(e.executedPlan) }

  // bounded-broadcast-by-construction: ANN scoring joins broadcast the
  // (guarded) query/probe side with a non-equi or free condition,
  // tf-idf attaches the TakeOrdered vocab list, and the mixture plan
  // attaches two ONE-ROW aggregates (total, binding scale) — all
  // driver-bounded
  // (q105/q106 attach the dims-bounded one-row mean/range aggregate;
  // q112 attaches the one-row sqrt-weight/token total and q114 the
  // one-row quartile bounds, same shape as q93's)
  private val bnljAllowed = Set(
    "q24_ann_bruteforce", "q25_ann_ivf", "q34_ann_kmeans",
    "q77_tfidf_terms", "q93_mixture_plan", "q100_vocab_drift",
    "q105_embed_center", "q106_quantize_error", "q112_temperature_mix",
    "q114_curriculum_phases", "q117_mixture_apply",
    // q132 broadcasts the guarded probe frame with a label-inequality
    // condition — the q24 ANN-scoring shape
    "q132_cross_mining",
    // q145 attaches the one-row corpus-size aggregate, q77's shape
    "q145_pmi_pairs",
    // q146 builds the (group x bin) grid: the broadcast side is the
    // per-bin baseline — at most 65 log2 buckets by construction
    "q146_psi_drift",
    // q151 attaches the one-row histogram-total aggregate (q93 shape)
    "q151_streaming_drift",
    // q152 attaches the one-row vocabulary-size aggregate; q153 the
    // one-row global-centroid aggregate (q105's shape); q168 the
    // one-row session-total aggregate
    "q152_bigram_lm", "q153_centroid_drift", "q168_type_affinity",
    // q183 builds the (group x observed-value) grid plus the one-row
    // corpus total, and windowlessly cumulates the value histogram by
    // a non-equi self-join — every broadcast side is bounded by the
    // measure's DISTINCT-VALUE count (the operator's contract)
    "q183_ks_drift",
    // q186 attaches the one-row digit-total aggregate (q93 shape)
    "q186_benford",
    // q189 attaches the one-row firewalled-train count; the literal
    // split key folds out of the equi-condition, leaving a one-row
    // broadcast loop join
    "q189_firewalled_split",
    // q193 attaches the one-row token-total aggregate (q93 shape)
    "q193_vocab_coverage",
    // q197 attaches the one-row balance-threshold aggregate (q93 shape)
    "q197_idle_balances",
    // q203 attaches the one-row total-and-count aggregate (q93 shape);
    // q211/q237 the one-row basket-count aggregate (q204's max-attach
    // becomes a BroadcastHashJoin: its DECIMAL equality is a join key)
    "q203_part_concentration", "q211_basket_affinity",
    "q237_association_rules",
    // q224 builds the source-pair table: |sources|² rows by a
    // broadcast loop join under the src_a < src_b inequality —
    // nature-bounded like q146's bin grid
    "q224_source_divergence",
    // q228 grids every class against the nature-bounded
    // sensitive-value table (q146's bin-grid shape)
    "q228_t_closeness",
    // q252/q253 attach one-row contingency totals (statistic, dof,
    // corpus size) onto the |a|·|b| cell grid — q93's one-row
    // broadcast-attach shape, several times over
    "q252_chi_square", "q253_mutual_info",
    // q255 ranks its K-row top-terms cut by a broadcast order-predicate
    // self-join (K <= 10^4 contract constant); q256 is two q24-shaped
    // ANN scorings (broadcast query set under an id-inequality)
    "q255_zipf_fit", "q256_rrf_fusion",
    // q260 attaches the one-row max-timestamp reference (q93 shape);
    // q264 attaches the one-row global-day and quintile-boundary
    // aggregates onto the per-user RFM table (q93 shape, twice);
    // q265 attaches the one-row max-item-id aggregate (q93 shape);
    // q266 is q211's basket machinery (one-row basket-count attach)
    "q260_decayed_scores", "q264_rfm_segments", "q265_negative_samples",
    "q266_session_affinity",
    // q269 attaches the one-row global-month count; q270/q274 the
    // one-row max-day trim bound (q93 shape)
    "q269_abc_xyz", "q270_rolling_actives", "q274_streaming_actives",
    // q283/q284 attach one-row class-totals / global-rate aggregates
    // (q93 shape)
    "q283_woe_iv", "q284_p_chart",
    // q286 reads the WoE state through the same one-row totals attach;
    // q288 attaches the one-row global period count (q269 shape)
    "q286_streaming_woe", "q288_dispersion",
    // q295 trims the phantom max+1 churn row with a one-row max-period
    // attach (q93 shape)
    "q295_revenue_bridge",
    // q316 attaches TWO one-row set-count aggregates (n_true, tp)
    // onto the one-row n_pred aggregate (q93's shape, twice)
    "q316_linkage_quality",
    // q335 attaches the one-row threshold-value and threshold-tie
    // aggregates onto the ≤(k+1)-row top table (q316's shape)
    "q335_hill_tail",
    // q349 builds the G×K grid by crossing the ≤maxGroups group-total
    // table with the broadcast top-K word cut — nature-bounded like
    // q146's bin grid (a driver count pre-checks G ≤ maxGroups)
    "q349_burrows_delta",
    // q350 attaches the one-row corpus-token total (q77/q93 shape)
    "q350_keyness",
    // q353 reads the same G×K freqGrid crossJoin(broadcast) as q349
    "q353_lexical_dispersion",
    // q364 attaches the one-row (N, total-tokens) corpus aggregate
    // (q77/q93 shape)
    "q364_bm25",
    // q384/q385 attach one-row corpus-total aggregates (q93 shape)
    "q384_collocations", "q385_log_odds")

  test("no query plan contains a cartesian product") {
    for ((name, p) <- formatted)
      withClue(s"$name:\n") { p should not include "CartesianProduct" }
  }

  test("nested-loop joins appear only where a bounded side is broadcast by construction") {
    for ((name, p) <- formatted if !bnljAllowed(name))
      withClue(s"$name:\n") { p should not include "BroadcastNestedLoopJoin" }
    // and the allowlist stays honest: entries that stop using BNLJ should
    // be removed so a future regression cannot hide behind them
    for (name <- bnljAllowed)
      withClue(s"$name:\n") { formatted(name) should include("BroadcastNestedLoopJoin") }
  }

  test("no single-partition Window outside positionalZip") {
    for ((name, ns) <- nodes if name != "q15_positional_zip") {
      val empty = ns.collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w
        case w: WindowGroupLimitExec if w.partitionSpec.isEmpty => w
      }
      withClue(s"$name has empty-partition windows:\n${empty.mkString("\n")}\n") {
        empty shouldBe Symbol("empty")
      }
    }
    // the one sanctioned case still exists (guarded inside positionalZip)
    nodes("q15_positional_zip").exists {
      case w: WindowExec => w.partitionSpec.isEmpty
      case _ => false
    } shouldBe true
  }

  test("no Sort directly over a SinglePartition exchange outside positionalZip") {
    for ((name, ns) <- nodes if name != "q15_positional_zip") {
      val bad = ns.collect {
        case s: SortExec if s.child.isInstanceOf[ShuffleExchangeExec] &&
          s.child.asInstanceOf[ShuffleExchangeExec].outputPartitioning == SinglePartition => s
      }
      withClue(s"$name single-partition sorts:\n${bad.mkString("\n")}\n") {
        bad shouldBe Symbol("empty")
      }
    }
  }

  test("dim joins broadcast via explicit hints, not the size threshold") {
    // with auto-broadcast disabled, only an explicit broadcast() hint can
    // produce a BroadcastHashJoin — fewer hash joins than hints means a
    // hint was lost in a refactor. Fact-to-fact joins (orders⋈customer
    // in q03, all of q04) are allowed to SortMergeJoin: that IS the
    // correct 100-TB plan for two unbounded sides.
    val hints = Map( // query -> explicit broadcast() hints in its chain
      "q03_star_join" -> 2, // nation, region
      "q09_topk" -> 1, // part
      // (q18 hints too, but its weights join runs inside the eager
      // driver-side pack — the returned frame is a LocalTableScan)
      "q66_decontamination" -> 1, // guarded eval-gram set
      // (q84 deliberately unhinted: parent key sets are unbounded at
      // scale, so the plan is AQE's call, not a pinned broadcast)
      "q85_oov_rates" -> 1) // top-V vocab
    val conf = spark.conf
    val prev = conf.get("spark.sql.autoBroadcastJoinThreshold")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      for ((name, n) <- hints) {
        val p = SparkEntry.queries(name)(spark, sfDir)
          .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
        withClue(s"$name (auto-broadcast off):\n$p\n") {
          "BroadcastHashJoin".r.findAllIn(p).size should be >= n
        }
      }
    } finally conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("top-k queries collapse to WindowGroupLimit") {
    // rank<=k must be pushed into the shuffle as a group-limit — a plain
    // Window + Filter ranks every row in the group before discarding
    for (name <- Seq("q08_keep_first", "q19_snapshot_chain", "q35_replay_pipeline",
        "q37_upsert_keep_first", "q73_domain_caps", "q77_tfidf_terms")) {
      withClue(s"$name:\n${formatted(name)}\n") {
        formatted(name) should include("WindowGroupLimit")
      }
    }
  }

  test("global top-k queries collapse to TakeOrderedAndProject") {
    // orderBy+limit must fuse (per-partition top-k + k-bounded merge),
    // never a full global sort feeding a limit
    for (name <- Seq("q09_topk", "q12_explode_tokens", "q85_oov_rates")) {
      withClue(s"$name:\n${formatted(name)}\n") {
        formatted(name) should include("TakeOrderedAndProject")
      }
    }
  }

  test("filter-bearing scans keep non-empty pushed filters") {
    val pf = """PushedFilters: \[([^\]]+)\]""".r
    for (name <- Seq("q02_filter_project", "q03_star_join", "q09_topk",
        "q17_tumbling_window", "q24_ann_bruteforce", "q47_hash_sample",
        "q63_asof_nearest", "q68_stratified_sample", "q72_chunk_docs",
        "q83_gap_fill")) {
      withClue(s"$name:\n${formatted(name)}\n") {
        pf.findFirstMatchIn(formatted(name))
          .exists(_.group(1).trim.nonEmpty) shouldBe true
      }
    }
  }
}
