package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-up generator: writes a `factor`× replica of a
  * driver testdata dir (default sf0.1 → target/testdata/sf1.0) with the
  * SAME schemas and single-file-per-table layout, so the full Verify +
  * DuckDB oracle gate and Bench run unchanged against the output. This
  * is the scale ratchet the sf0.1 fixtures cannot provide: the first
  * step that can expose super-linear tails (prefix-join candidate
  * growth, the >2M-edge components path, aggregate-width costs).
  *
  * Replication is NOT naive duplication — that would change the
  * PROBLEM, not just the size: 10 exact copies of every document make
  * banded near-dup candidates grow ~100× for 10× data (every LSH
  * bucket gets 10× denser), drowning the linear signal in an artifact
  * of the generator. Instead each replica is structurally ISOMORPHIC
  * and pairwise DISJOINT where pair-generating operators look:
  *
  *  - Surrogate keys shift by `replica × (max_key + 1)`, with the FK
  *    stride taken from the owning table (orders.o_custkey moves by
  *    customer's stride), so join fan-outs per key are EXACTLY sf0.1's.
  *  - `documents.text` gets a per-replica Caesar rotation over
  *    [a-z]/[A-Z]/[0-9] (`translate`, bijective): token multisets,
  *    shingle sets, and char-gram sets are preserved within a replica
  *    (every equality-based statistic is isomorphic) and DISJOINT
  *    across replicas — near-dup/winnowing/prefix-join pair counts
  *    scale exactly ×factor. Whitespace and punctuation are untouched,
  *    so token boundaries, lengths, and paragraph structure survive.
  *  - `embeddings.embedding` gets a per-replica deterministic ±1 sign
  *    pattern: within-replica geometry (norms, dot products, cosines)
  *    is exactly preserved; cross-replica cosines decorrelate to ~0,
  *    so ANN/near-dup candidate structure scales ×factor.
  *  - Dimension STRINGS (names, brands, types, event_type, props) are
  *    kept verbatim: the fuzzy-ER operators dedup to DISTINCT names
  *    before pairing, so identical replicas collapse there, and
  *    bounded vocabularies (brand, segment, event_type) stay bounded.
  *  - Timestamps are kept verbatim: replicas share the time axis, so
  *    per-window densities grow ×factor while calendars, session gaps,
  *    and watermark semantics are unchanged.
  *
  * region/nation are fixed dimensions and copy verbatim.
  *
  * Usage: runMain graft.ScaleUp [srcDir] [outDir] [factor]
  */
object ScaleUp {
  private val LOWER = ('a' to 'z').mkString
  private val UPPER = ('A' to 'Z').mkString
  private val DIGIT = ('0' to '9').mkString
  private val FROM = LOWER + UPPER + DIGIT
  private def rot(s: String, k: Int) = {
    val m = k % s.length; s.drop(m) + s.take(m)
  }
  /** Per-replica bijective character map; replica 0 is the identity. */
  private def shiftedAlphabet(i: Int): String =
    rot(LOWER, i) + rot(UPPER, i) + rot(DIGIT, i)

  /** Per-replica ±1 sign pattern (replica 0 all +1): a fixed odd-
    * multiplier hash of (replica, dim) — deterministic across runs.
    */
  private def signs(i: Int, dims: Int): Seq[Float] =
    (0 until dims).map { d =>
      if (i == 0) 1.0f
      else {
        val h = (i.toLong * 2654435761L + d.toLong * 40503L) >>> 13
        if ((h & 1L) == 1L) -1.0f else 1.0f
      }
    }

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("target/testdata/sf1.0")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    require(factor >= 1, s"factor must be >= 1: $factor")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import java.nio.file.{Files, Paths, StandardCopyOption}

    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")
    // single FILE per table (not a directory): the DuckDB oracle reads
    // '{dir}/{t}.parquet' as one file, mirroring the driver's layout
    def write(df: DataFrame, t: String): Unit = {
      val tmp = s"$out/__tmp_$t"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"no part file written for $t"))
      Files.createDirectories(Paths.get(out))
      Files.move(part.toPath, Paths.get(s"$out/$t.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
      graft.sources.PathIO.deleteDir(spark, tmp)
      val n = spark.read.parquet(s"$out/$t.parquet").count()
      println(f"$t%-12s rows=$n%,d")
    }
    def stride(df: DataFrame, key: String): Long =
      df.agg(max(col(key)).cast("long")).head().getLong(0) + 1L
    def rep(df: DataFrame)(f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until factor).map(i => f(df, i)).reduce(_ unionByName _)

    write(read("region"), "region")
    write(read("nation"), "nation")

    val cust = read("customer")
    val sup = read("supplier")
    val part = read("part")
    val ords = read("orders")
    val sCust = stride(cust, "c_custkey")
    val sSup = stride(sup, "s_suppkey")
    val sPart = stride(part, "p_partkey")
    val sOrd = stride(ords, "o_orderkey")

    write(rep(cust)((d, i) =>
      d.withColumn("c_custkey", col("c_custkey") + lit(i * sCust))),
      "customer")
    write(rep(sup)((d, i) =>
      d.withColumn("s_suppkey", col("s_suppkey") + lit(i * sSup))),
      "supplier")
    write(rep(part)((d, i) =>
      d.withColumn("p_partkey", col("p_partkey") + lit(i * sPart))),
      "part")
    write(rep(ords)((d, i) => d
      .withColumn("o_orderkey", col("o_orderkey") + lit(i * sOrd))
      .withColumn("o_custkey", col("o_custkey") + lit(i * sCust))),
      "orders")
    write(rep(read("lineitem"))((d, i) => d
      .withColumn("l_orderkey", col("l_orderkey") + lit(i * sOrd))
      .withColumn("l_partkey", col("l_partkey") + lit(i * sPart))
      .withColumn("l_suppkey", col("l_suppkey") + lit(i * sSup))),
      "lineitem")

    val ev = read("events")
    val sEvt = stride(ev, "event_id")
    val sUsr = stride(ev, "user_id")
    write(rep(ev)((d, i) => d
      .withColumn("event_id", col("event_id") + lit(i * sEvt))
      .withColumn("user_id", col("user_id") + lit(i * sUsr))),
      "events")

    val docs = read("documents")
    val sDoc = stride(docs, "doc_id")
    write(rep(docs)((d, i) => d
      .withColumn("doc_id", col("doc_id") + lit(i * sDoc))
      .withColumn("text",
        if (i == 0) col("text")
        else translate(col("text"), FROM, shiftedAlphabet(i)))),
      "documents")

    val emb = read("embeddings")
    val sVec = stride(emb, "vec_id")
    val dims = emb.select(size(col("embedding"))).head().getInt(0)
    write(rep(emb)((d, i) => d
      .withColumn("vec_id", col("vec_id") + lit(i * sVec))
      .withColumn("embedding",
        if (i == 0) col("embedding")
        else zip_with(col("embedding"), typedLit(signs(i, dims)),
          (x, f) => x * f))),
      "embeddings")

    spark.stop()
  }
}
