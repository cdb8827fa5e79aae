package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Referential-integrity audit — the data-quality gate a star schema
  * runs before serving: per foreign-key relation, how many child rows
  * carry a null key and how many carry a key with no parent (orphans).
  * The reference loads its star schema with `NOT NULL` FK columns and
  * trusts ingest ordering; at warehouse scale that trust is a report.
  *
  * Each relation is one left-anti join on the key — null keys are
  * counted separately first and EXCLUDED from the orphan join (a null
  * never equi-matches, so anti-join semantics would silently lump
  * "missing key" and "dangling key" together — different failures
  * with different fixes). Parent sides dedupe to their key column, so
  * the joins are key-vs-key regardless of parent width; Spark
  * broadcasts the small dimension sides on its own.
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
      val keys = child.select(col(ck).as("__k"))
      val counts = keys.agg(
        count(lit(1)).as("n_child"),
        (count(lit(1)) - count(col("__k"))).as("n_null_keys"))
      val orphans = keys.filter(col("__k").isNotNull)
        .join(parent.select(col(pk).as("__k")).distinct(), Seq("__k"), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
      counts.join(orphans)
        .select(lit(name).as("relation"), col("n_child"),
          col("n_null_keys"), col("n_orphans"))
    }.reduce(_ unionByName _)
  }
}
