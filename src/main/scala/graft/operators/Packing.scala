package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing and document chunking — the two shape transforms a
  * training-data pipeline applies between curation and tokenization.
  *
  * Packing follows the concat-and-chunk discipline (GPT-style): the
  * corpus is treated as one deterministic token stream per shard and cut
  * into fixed token-budget context windows; a document belongs to the
  * window its first token falls in. This formulation is a pure window
  * aggregation — no driver loop, no bin-packing search — so it scales
  * linearly: each shard's stream is independent, and within a shard the
  * cumulative sum is one sort + one pass (Spark's running-window frame).
  * Contrast `plans.BinPacking` (SURVEY §2.10), which solves the
  * first-fit-decreasing HOST-assignment problem on a small aggregate —
  * packing here is corpus-scale, so search is off the table by design.
  *
  * Chunking splits long documents into fixed-size overlapping windows
  * (RAG / long-doc pretraining shape): a per-row explode of computed
  * offsets, shuffle-free, and the chunk count per document is bounded by
  * ceil(len / stride) so output volume is a constant factor of input.
  */
object Packing {

  /** Annotate each row with its context-window assignment under
    * concat-and-chunk packing: within each `shardCol` group, rows are
    * ordered by `orderCol` (a total order — id, not arrival), token
    * counts accumulate, and a row lands in pack `floor(tokensBefore /
    * budget)` at offset `tokensBefore % budget`.
    *
    * The shard column bounds the window partition: packing is
    * shard-local exactly as it is in a real pipeline (each output shard
    * is packed independently by its writer task), so no global ordering
    * or single-partition window is ever required — at 100 TB the shards
    * ARE the parallelism.
    *
    * Output: input columns + `n_tokens`, `pack_seq`, `pack_offset`.
    */
  def packByConcat(df: DataFrame, tokensCol: Column, budget: Long,
                   shardCol: String, orderCol: String): DataFrame = {
    require(budget > 0, s"pack budget must be positive: $budget")
    // same guard discipline as StreamingBudget.screenBatch: silently
    // overwriting a pre-existing n_tokens would also feed the window's
    // sum the overwritten column
    val reserved = Set("n_tokens", "pack_seq", "pack_offset")
    val clash = df.columns.toSet.intersect(reserved)
    require(clash.isEmpty,
      s"input columns collide with packByConcat output names: $clash")
    val w = Window.partitionBy(col(shardCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val before = coalesce(sum(col("n_tokens")).over(w), lit(0L))
    df.withColumn("n_tokens", tokensCol.cast("long"))
      .withColumn("pack_seq", floor(before / lit(budget)).cast("long"))
      .withColumn("pack_offset", (before % lit(budget)).cast("long"))
  }

  /** Explode each document into fixed-size character windows with
    * overlap: window i starts at `i * stride` (stride = size − overlap)
    * and spans `size` characters (the last window is shorter). Documents
    * with empty text produce no chunks. Offsets are computed per-row
    * (`sequence` + `posexplode`), so the transform is embarrassingly
    * parallel and never shuffles.
    *
    * Output: `idCol`, `chunk_idx`, `start`, `chunk_len`, `chunk_md5` —
    * the hash stands in for the chunk payload so downstream exact-dedup
    * of chunks (the usual next stage) needs no second text scan.
    */
  def chunkDocs(df: DataFrame, textCol: String, idCol: String,
                size: Int, stride: Int): DataFrame = {
    require(size > 0 && stride > 0 && stride <= size,
      s"need 0 < stride <= size: size=$size stride=$stride")
    val text = col(textCol)
    val chunk = text.substr(col("start") + 1, lit(size))
    df.filter(char_length(text) > 0)
      .select(col(idCol), text,
        posexplode(sequence(lit(0), char_length(text) - 1, lit(stride)))
          .as(Seq("chunk_idx", "start")))
      .select(col(idCol),
        col("chunk_idx").cast("long").as("chunk_idx"),
        col("start").cast("long").as("start"),
        char_length(chunk).cast("long").as("chunk_len"),
        md5(chunk).as("chunk_md5"))
  }

  /** Explode each document into TOKEN-aligned overlapping context
    * windows — the per-document sliding-window shape LM tokenizers
    * feed (HF `return_overflowing_tokens` + stride): window i starts
    * at token `i * stride` and spans `size` tokens, and emission STOPS
    * at the first window that reaches the document's end, so no
    * trailing window is a strict suffix of its predecessor (the tail
    * rule `chunkDocs` deliberately lacks — character chunks keep every
    * stride offset for RAG recall; training windows must not repeat
    * tail tokens as near-identical examples). Every token is covered;
    * the last window keeps between `size − stride + 1` and `size`
    * tokens; documents with no tokens produce no row.
    *
    * Offsets are computed per-row (`sequence` + `posexplode`) like
    * `chunkDocs` — embarrassingly parallel, no shuffle, output volume
    * ≤ ceil(n / stride) windows per document.
    *
    * Output: `idCol`, `win_idx`, `start_tok`, `win_tokens`, `win_md5`
    * (hash of the space-joined window payload, so downstream
    * window-level exact dedup needs no second scan).
    */
  def tokenWindows(df: DataFrame, textCol: String, idCol: String,
                   size: Int, stride: Int): DataFrame = {
    require(size > 0 && stride > 0 && stride <= size,
      s"need 0 < stride <= size: size=$size stride=$stride")
    val toks = graft.functions.TextFns.tokens(col(textCol))
    val win = slice(col("__toks"), col("start_tok") + 1, lit(size))
    df.select(col(idCol), toks.as("__toks"))
      .filter(size2(col("__toks")) > 0)
      .select(col(idCol), col("__toks"),
        posexplode(sequence(lit(0),
          when(size2(col("__toks")) <= size, lit(0)).otherwise(
            floor((size2(col("__toks")) - size + (stride - 1)) /
              lit(stride)).cast("int") * stride),
          lit(stride))).as(Seq("win_idx", "start_tok")))
      .select(col(idCol),
        col("win_idx").cast("long").as("win_idx"),
        col("start_tok").cast("long").as("start_tok"),
        size2(win).cast("long").as("win_tokens"),
        md5(concat_ws(" ", win)).as("win_md5"))
  }

  /** Sentence-respecting chunking — the RAG/embedding prep step
    * between q72's fixed-size character chunks and q121's token
    * windows: documents split into sentences (portable RE2 split on
    * `[.!?]\s+` — no lookbehind, so terminal punctuation rides with
    * the NEXT boundary's delimiter and the last sentence keeps its
    * own), each sentence assigned to chunk
    * floor(cumulative-tokens-before / tokenBudget), so chunks are
    * ~budget-sized and NEVER split a sentence. The division-based
    * assignment (vs a greedy reset) is what keeps the operator
    * engine-replayable: the chunk id is a pure function of the exact
    * integer prefix sum.
    *
    * Scale shape: per-document sentence explode + ONE per-document
    * window prefix sum (rows = sentences of that doc) + a hash
    * aggregate on (doc, chunk). No global window, no driver state.
    */
  def sentenceChunks(df: DataFrame, textCol: String, idCol: String,
                     tokenBudget: Long): DataFrame = {
    require(tokenBudget > 0, s"tokenBudget must be positive: $tokenBudget")
    // chunk_id in particular: withColumn would silently REPLACE an
    // id column of that name and merge chunks across documents
    val reserved = Set("sent_idx", "__sent", "__tok", "__before",
      "chunk_id", "n_sentences", "n_tokens")
    require(!reserved(idCol) && !reserved(textCol),
      s"idCol/textCol collide with bookkeeping/output names: $idCol/$textCol")
    val w = Window.partitionBy(col(idCol)).orderBy(col("sent_idx"))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(col(idCol),
        posexplode(filter(split(col(textCol), "[.!?]\\s+"),
          s => length(s) > 0)).as(Seq("sent_idx", "__sent")))
      .withColumn("__tok",
        graft.functions.TextFns.bpeishTokenCount(col("__sent")))
      .withColumn("__before", coalesce(sum(col("__tok")).over(w), lit(0L)))
      .withColumn("chunk_id", floor(col("__before") / lit(tokenBudget)).cast("long"))
      .groupBy(col(idCol), col("chunk_id"))
      .agg(count(lit(1)).cast("long").as("n_sentences"),
        sum(col("__tok")).cast("long").as("n_tokens"))
  }

  // functions.size, renamed clear of Window/DataFrame method shadowing
  private def size2(c: Column): Column = org.apache.spark.sql.functions.size(c)

  /** Slice a hash-shuffled corpus into EXACT fixed-size training
    * shards: `shard_id = shuffle_rank / shardSize`, so every shard
    * holds exactly `shardSize` rows (the last one fewer) in the
    * decorrelated `Sampling.shuffleRank` order. This is the writer
    * path the shuffleRank scaladoc promises — materialize the rank
    * once, then `partitionBy("shard_id")` writes the epoch's shard
    * files without a second corpus pass or a global sort.
    *
    * Same snapshot assumption as shuffleRank (the input must be
    * deterministic between construction and execution).
    */
  def shardByRank(df: DataFrame, keyCol: String, shardSize: Long,
                  hexPrefix: Int = 3): DataFrame = {
    require(shardSize > 0, s"shardSize must be positive: $shardSize")
    // same reserved-name discipline as packByConcat: re-sharding a
    // frame that already carries shard_id would silently overwrite it
    val clash = df.columns.toSet.intersect(Set("shard_id", "shuffle_rank"))
    require(clash.isEmpty,
      s"input columns collide with shardByRank output names: $clash")
    Sampling.shuffleRank(df, keyCol, hexPrefix)
      .withColumn("shard_id",
        floor(col("shuffle_rank") / lit(shardSize)).cast("long"))
  }

  /** Reshard-churn audit: what fraction of keys MOVE when the shard
    * count changes from `fromShards` to `toShards`, under (a) plain
    * modulo placement and (b) rendezvous (highest-random-weight)
    * hashing? The capacity-planning card behind "can we grow the
    * bucketed layout without rewriting everything": modulo reshuffles
    * nearly everything (only keys with h ≡ same residue mod lcm
    * stay), rendezvous moves ≈ (m−n)/m — exactly the keys a new
    * shard wins.
    *
    * ENTIRELY exact and engine-neutral: the key hash is the md5
    * 15-hex-digit prefix (the `deterministicSample` house hash — no
    * engine-private Murmur), per-shard rendezvous weights are
    * md5(key ‖ ':' ‖ shard) prefixes, the winner is the
    * lexicographically greatest (weight, shard) pair, and the churn
    * rates are ·10⁶ integer floor divisions. Output is ONE row.
    *
    * Scale shape: one explode of max(from, to) weight rows per key —
    * `require`d ≤ 256 shards, so the explode is a bounded constant —
    * then one per-key argmax hash aggregate (both placements answered
    * by conditional maxes over the same explode) and one global
    * aggregate. No windows, no joins.
    */
  def reshardChurn(df: DataFrame, keyCol: String, fromShards: Int,
                   toShards: Int): DataFrame = {
    require(fromShards >= 1 && fromShards <= 256 &&
      toShards >= 1 && toShards <= 256,
      s"shard counts must be in [1, 256]: $fromShards -> $toShards")
    require(fromShards != toShards,
      "fromShards == toShards: nothing can move")
    val mx = math.max(fromShards, toShards)
    val keys = df.filter(col(keyCol).isNotNull)
      .select(col(keyCol).cast("string").as("__key")).distinct()
      .withColumn("__h",
        conv(substring(md5(col("__key")), 1, 15), 16, 10).cast("long"))
    val weighted = keys
      .select(col("__key"), col("__h"),
        explode(sequence(lit(0), lit(mx - 1))).as("__s"))
      .withColumn("__w",
        conv(substring(md5(concat(col("__key"), lit(":"),
          col("__s").cast("string"))), 1, 15), 16, 10).cast("long"))
    val perKey = weighted.groupBy(col("__key"))
      .agg(first(col("__h")).as("__h"),
        max(when(col("__s") < fromShards,
          struct(col("__w"), col("__s").cast("long").as("__s"))))
          .as("__mf"),
        max(when(col("__s") < toShards,
          struct(col("__w"), col("__s").cast("long").as("__s"))))
          .as("__mt"))
      .select(col("__key"),
        pmod(col("__h"), lit(fromShards.toLong)).as("__ma"),
        pmod(col("__h"), lit(toShards.toLong)).as("__mb"),
        col("__mf.__s").as("__ha"), col("__mt.__s").as("__hb"))
    perKey.agg(count(lit(1)).cast("long").as("n_keys"),
        sum(when(col("__ma") =!= col("__mb"), 1L).otherwise(0L))
          .cast("long").as("moved_mod"),
        sum(when(col("__ha") =!= col("__hb"), 1L).otherwise(0L))
          .cast("long").as("moved_hrw"))
      .select(col("n_keys"), col("moved_mod"),
        expr("""CASE WHEN n_keys = 0 THEN NULL
          ELSE CAST(CAST(moved_mod AS DECIMAL(19,0)) * 1000000
            DIV n_keys AS BIGINT) END""").as("churn_mod_ppm"),
        col("moved_hrw"),
        expr("""CASE WHEN n_keys = 0 THEN NULL
          ELSE CAST(CAST(moved_hrw AS DECIMAL(19,0)) * 1000000
            DIV n_keys AS BIGINT) END""").as("churn_hrw_ppm"))
  }
}
