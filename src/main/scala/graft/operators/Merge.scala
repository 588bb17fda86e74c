package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Snapshot maintenance: upsert, delete, and diff over keyed immutable
  * snapshots — the merge surface a parquet-based corpus needs between full
  * rebuilds (no transaction log available or required: each operation
  * produces a new snapshot, which is how 100 TB datasets version anyway).
  *
  * All three are single equi-shuffle plans on the key (anti-join + union,
  * or one full outer join) — no driver materialization, no iteration.
  */
object Merge {

  /** New snapshot with `updates` applied over `base`: an updated key takes
    * the update row, an unseen key is inserted, everything else carries
    * over. Both inputs must share the schema.
    */
  def upsert(base: DataFrame, updates: DataFrame, key: String): DataFrame =
    base.join(updates.select(key), Seq(key), "left_anti").unionByName(updates)

  /** Upsert where `updates` may carry several versions per key: the row
    * with the highest `versionCol` wins (arrival order never matters, so
    * replayed/out-of-order batches converge to the same snapshot).
    */
  def upsertLatest(base: DataFrame, updates: DataFrame, key: String,
      versionCol: Column): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(versionCol.desc)
    val latest = updates.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1).drop("__rk")
    upsert(base, latest, key)
  }

  /** New snapshot with the keys in `tombstones` removed. */
  def applyDeletes(base: DataFrame, tombstones: DataFrame, key: String): DataFrame =
    base.join(tombstones.select(key), Seq(key), "left_anti")

  /** Change-data view between two snapshots of the same schema: one row per
    * key that was `inserted`, `deleted`, or `changed` (any non-key column
    * differs), with a `change` column saying which. Unchanged keys are
    * absent. One full outer join; the row comparison hashes the non-key
    * columns so wide schemas do not multiply the join condition.
    */
  def diff(oldSnap: DataFrame, newSnap: DataFrame, key: String): DataFrame = {
    val dataCols = oldSnap.columns.filterNot(_ == key).sorted.toSeq
    require(dataCols == newSnap.columns.filterNot(_ == key).sorted.toSeq,
      "diff requires identical schemas")
    def fp(df: DataFrame): DataFrame = df.select(
      col(key),
      md5(to_json(struct(dataCols.map(c => col(c).as(c)): _*))).as("__fp"))
    val o = fp(oldSnap).withColumnRenamed("__fp", "__old")
    val n = fp(newSnap).withColumnRenamed("__fp", "__new")
    o.join(n, Seq(key), "full_outer")
      .withColumn("change",
        when(col("__old").isNull, "inserted")
          .when(col("__new").isNull, "deleted")
          .when(col("__old") =!= col("__new"), "changed"))
      .where(col("change").isNotNull)
      .select(col(key), col("change"))
  }
}
