package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket pair affinity — which items co-occur in the same
  * basket more often than their popularity predicts. The co-purchase
  * analog of q145's document-level PMI: support counts for each
  * unordered item pair plus lift against the independence baseline.
  *
  * Lift is emitted in basis points by BIGINT floor arithmetic
  * (n_ab * n_baskets * 10000 div (n_a * n_b)) so the value is exact
  * and engine-portable — no float ratio enters the comparison; >10000
  * means the pair attracts, <10000 means it repels. Overflow
  * contract: the numerator n_ab * n_baskets * 10^4 must stay below
  * 2^63 — i.e. pair support × basket count < 9.2e14. The contract is
  * ENFORCED at runtime: non-ANSI Spark would wrap the BIGINT multiply
  * silently (where DuckDB raises), so each output row is guarded by an
  * integer pre-check that calls raise_error before the multiply can
  * wrap. At corpus sizes past the bound (1e10 baskets with
  * 1e5-support pairs), compute lift on the per-shard pair tables and
  * merge supports first, or drop to a DOUBLE ratio (losing the
  * exact-hash property, not correctness).
  *
  * Scale shape: the pair expansion is per-basket (collect_set then the
  * native `PairCombos` loop), so cost is sum over baskets of
  * m*(m-1)/2 with m = DISTINCT items in that basket — bounded by the
  * basket-size contract of the data (order forms, carts), never by
  * corpus size; there is no item-level self-join. The item-count and
  * basket-count attachments are one hash aggregate each; everything
  * downstream of the explode is (item_a, item_b) hash aggregation.
  * A degenerate giant basket would surface in the same way as a hot
  * LSH bucket (q126's audit applies verbatim).
  */
object Basket {

  /** The guarded exact-lift expression over the internal projection
    * (n_ab, __nb, __na, __nb_i). BOTH sides of the division are
    * pre-checked: the numerator n_ab·n_baskets·10^4 and the
    * denominator n_a·n_b can each wrap past 2^63 independently.
    * Exposed at package scope so the spec can exercise the overflow
    * guard directly — the bounds (≥ ~9.2e14 products) are unreachable
    * from realistic in-test row counts.
    */
  private[operators] def liftBpExpr: org.apache.spark.sql.Column =
    // overflow guard BEFORE the multiply: in non-ANSI mode
    // n_ab * __nb * 10000 wraps silently past 2^63, emitting a
    // wrong lift with no signal. The pre-check is pure BIGINT
    // division (never overflows) and stays inside codegen.
    expr("""CASE
              WHEN __nb > 922337203685477L
                OR n_ab > 9223372036854775807L DIV (__nb * 10000)
                OR __na > 9223372036854775807L DIV __nb_i
              THEN CAST(raise_error(CONCAT(
                'Basket.pairAffinity lift_bp overflow: numerator n_ab * n_baskets * 10^4 or denominator n_a * n_b exceeds BIGINT (n_ab=',
                CAST(n_ab AS STRING), ', n_baskets=', CAST(__nb AS STRING),
                ', n_a=', CAST(__na AS STRING), ', n_b=', CAST(__nb_i AS STRING),
                '); merge per-shard pair tables first')) AS BIGINT)
              ELSE CAST(n_ab * __nb * 10000 DIV (__na * __nb_i) AS BIGINT)
            END""")

  /** Shared pair-support core: deduplicated (basket, item) incidence,
    * per-pair supports, and per-item counts attached — everything
    * BEFORE the basket-count attachment, so callers that never read
    * lift ([[cosineTopK]]) don't execute the count_distinct aggregate
    * and its one-row broadcast. Returns (supports, incidence).
    */
  private def pairSupports(items: DataFrame, basketCol: String,
                           itemCol: String,
                           minPairs: Long): (DataFrame, DataFrame) = {
    require(minPairs >= 1L, s"minPairs must be >= 1, got $minPairs")
    // NULL keys are dropped up front: a NULL basket would weld every
    // keyless row into one phantom basket (inflating supports while
    // count_distinct excludes it from n_baskets), and a NULL item can
    // pair with nothing
    val b = items
      .filter(col(basketCol).isNotNull && col(itemCol).isNotNull)
      .select(col(basketCol).as("__basket"), col(itemCol).as("__item"))
      .distinct()
    val itemCounts = b.groupBy(col("__item"))
      .agg(count(lit(1)).as("__ni"))
    val pairs = b.groupBy(col("__basket"))
      .agg(array_sort(collect_set(col("__item"))).as("__ids"))
      .filter(size(col("__ids")) > 1)
      .select(explode(graft.expressions.GraftFunctions.pairCombos(col("__ids"))).as("p"))
      .groupBy(col("p.id_a").as("item_a"), col("p.id_b").as("item_b"))
      .agg(count(lit(1)).cast("long").as("n_ab"))
      .filter(col("n_ab") >= minPairs)
    (pairs
      .join(itemCounts.select(col("__item").as("item_a"), col("__ni").as("__na")),
        "item_a")
      .join(itemCounts.select(col("__item").as("item_b"), col("__ni").as("__nb_i")),
        "item_b"), b)
  }

  /** Pair support + lift over (basket, item) rows. Items are
    * de-duplicated within a basket; pairs below `minPairs` baskets are
    * dropped before the dimension attachments.
    */
  def pairAffinity(items: DataFrame, basketCol: String, itemCol: String,
                   minPairs: Long = 2L): DataFrame = {
    val (supports, b) = pairSupports(items, basketCol, itemCol, minPairs)
    val nBaskets = b.agg(count_distinct(col("__basket")).as("__nb"))
    supports
      .crossJoin(broadcast(nBaskets))
      .select(col("item_a"), col("item_b"), col("n_ab"),
        col("__na").cast("long").as("n_a"),
        col("__nb_i").cast("long").as("n_b"),
        liftBpExpr.as("lift_bp"))
  }

  /** Directed association rules over the pair-affinity table: each
    * unordered co-occurrence pair emits BOTH orientations with the
    * asymmetric confidence confidence_bp = n_ab * 10^4 div
    * n_antecedent ("given the antecedent is in the cart, how often is
    * the consequent?") alongside the symmetric lift — the
    * cross-sell-rule view where A→B strong / B→A weak is exactly the
    * signal (staple → accessory, not the reverse).
    *
    * Exactness: confidence in exact basis points by BIGINT floor
    * arithmetic; n_ab * 10^4 cannot overflow once [[pairAffinity]]'s
    * lift guard has passed (n_ab <= n_baskets and n_baskets * 10^4 is
    * pre-checked there). Scale shape: ONE pass of [[pairAffinity]]
    * plus a per-row 2-element struct explode — no union of two
    * projections (which would execute the whole basket pipeline twice
    * — the round-9 measured trap).
    */
  def associationRules(items: DataFrame, basketCol: String, itemCol: String,
                       minPairs: Long = 2L): DataFrame =
    pairAffinity(items, basketCol, itemCol, minPairs)
      .select(explode(array(
        struct(col("item_a").as("antecedent"), col("item_b").as("consequent"),
          col("n_a").as("n_antecedent"), col("n_b").as("n_consequent")),
        struct(col("item_b").as("antecedent"), col("item_a").as("consequent"),
          col("n_b").as("n_antecedent"), col("n_a").as("n_consequent"))))
        .as("r"), col("n_ab"), col("lift_bp"))
      .select(col("r.antecedent").as("antecedent"),
        col("r.consequent").as("consequent"), col("n_ab"),
        col("r.n_antecedent").as("n_antecedent"),
        col("r.n_consequent").as("n_consequent"),
        expr("CAST(n_ab * 10000 DIV r.n_antecedent AS BIGINT)")
          .as("confidence_bp"),
        col("lift_bp"))

  /** Item-item cosine² nearest neighbors over co-occurrence — the
    * "customers who bought X also bought" recommender shelf. Over the
    * binary basket-incidence vectors, cos(i,j)² = n_ij²/(n_i·n_j);
    * squaring keeps the score RATIONAL so the ranking runs on exact
    * integers. cos is monotone in cos², so the top-k order matches
    * the true cosine order UP TO the e8 resolution: partners whose
    * exact cos² values collapse to the same `cos2_e8` floor are
    * ordered by the (n_ab desc, partner asc) tiebreak, not by their
    * sub-1e-8 difference. Emitted as `cos2_e8` = n_ab²·10⁸ div
    * (n_a·n_b) in DECIMAL(38,0) floor arithmetic.
    *
    * Both orientations are emitted from ONE pair-support pass (the
    * [[associationRules]] explode shape, WITHOUT [[pairAffinity]]'s
    * basket-count attachment — nothing here reads lift), then
    * row_number per item over (cos2_e8 desc, n_ab desc, partner asc)
    * — exact-integer keys with a unique suffix, so the cut is
    * engine-replayable.
    *
    * Overflow: guarded HERE (this plan never executes pairAffinity's
    * lift guard): n_ab²·10⁸ needs n_ab < 10¹⁵ to stay inside
    * DECIMAL(38,0) — past it the row raises instead of letting
    * non-ANSI decimal overflow null the score silently.
    *
    * Scale shape: the per-basket pair bound, one 2-element explode,
    * one window PARTITIONED BY item (millions of small groups — no
    * global sort). Output ≤ k rows per item.
    */
  def cosineTopK(items: DataFrame, basketCol: String, itemCol: String,
                 k: Int = 5, minPairs: Long = 2L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("item_id"))
      .orderBy(col("cos2_e8").desc, col("n_ab").desc, col("partner"))
    pairSupports(items, basketCol, itemCol, minPairs)._1
      .select(col("item_a"), col("item_b"), col("n_ab"),
        col("__na").cast("long").as("n_a"),
        col("__nb_i").cast("long").as("n_b"))
      .select(explode(array(
        struct(col("item_a").as("item_id"), col("item_b").as("partner"),
          col("n_a").as("n_i"), col("n_b").as("n_j")),
        struct(col("item_b").as("item_id"), col("item_a").as("partner"),
          col("n_b").as("n_i"), col("n_a").as("n_j"))))
        .as("r"), col("n_ab"))
      .select(col("r.item_id").as("item_id"),
        col("r.partner").as("partner"), col("n_ab"),
        // >= not >: at n_ab = 10^15 exactly, n_ab^2*10^8 = 10^38 which
        // already exceeds DECIMAL(38,0)'s 10^38-1 max
        expr("""CASE WHEN n_ab >= 1000000000000000L
                THEN CAST(raise_error(CONCAT(
                  'Basket.cosineTopK overflow: n_ab^2 * 10^8 exceeds DECIMAL(38,0) (n_ab=',
                  CAST(n_ab AS STRING), '); shard the basket table first'))
                  AS BIGINT)
                ELSE CAST(CAST(n_ab AS DECIMAL(38,0)) * n_ab * 100000000
                DIV (CAST(r.n_i AS DECIMAL(38,0)) * r.n_j) AS BIGINT)
                END""")
          .as("cos2_e8"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }
}
