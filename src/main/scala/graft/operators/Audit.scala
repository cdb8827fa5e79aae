package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Referential-integrity audit — the data-quality gate a star schema
  * runs before serving: per foreign-key relation, how many child rows
  * carry a null key and how many carry a key with no parent (orphans).
  * The reference loads its star schema with `NOT NULL` FK columns and
  * trusts ingest ordering; at warehouse scale that trust is a report.
  *
  * Each relation is ONE pass over the child: a left join against the
  * deduped parent keys with a presence marker, then a single aggregate
  * reading off totals, null keys, and orphans. Null keys are counted
  * separately from orphans (a null never equi-matches, so anti-join
  * semantics would silently lump "missing key" and "dangling key"
  * together — different failures with different fixes). A fact table
  * appearing in k relations is scanned k times, not 2k (the
  * count-then-anti-join formulation's cost); parent sides are
  * key-vs-key regardless of width and broadcast on their own.
  */
object Audit {

  /** One row per relation: `relation`, `n_child`, `n_null_keys`,
    * `n_orphans`.
    *
    * @param relations (name, child, childKey, parent, parentKey)
    */
  def fkOrphans(relations: Seq[(String, DataFrame, String, DataFrame, String)])
      : DataFrame = {
    require(relations.nonEmpty, "no relations to audit")
    relations.map { case (name, child, ck, parent, pk) =>
      child.select(col(ck).as("__k"))
        .join(parent.select(col(pk).as("__k")).distinct()
          .withColumn("__present", lit(1)), Seq("__k"), "left")
        .agg(
          count(lit(1)).as("n_child"),
          (count(lit(1)) - count(col("__k"))).as("n_null_keys"),
          coalesce(sum(when(col("__k").isNotNull && col("__present").isNull,
            1L).otherwise(0L)), lit(0L)).as("n_orphans"))
        .select(lit(name).as("relation"), col("n_child"),
          col("n_null_keys"), col("n_orphans"))
    }.reduce(_ unionByName _)
  }
}
