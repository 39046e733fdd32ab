package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-capture over snapshots: derive the insert/delete/update
  * stream two dimension snapshots imply. This is how a pipeline without an
  * upstream CDC feed backfills one — diff yesterday's and today's snapshot,
  * feed the changes to the SCD2 builder ([[AsOfJoin]]) or a keyed upsert
  * ([[graft.sink.Sinks.upsertParquetPartitioned]]).
  *
  * Scale shape: ONE full-outer sort-merge join on the key — both snapshots
  * shuffle once on `keyCols`, nothing is broadcast or collected, and AQE is
  * free to pick the join strategy when one snapshot is bounded. Compared
  * columns are evaluated null-safely (`<=>`), so a null-to-value change is
  * an update and null-to-null is unchanged.
  */
object Cdc {

  /** Classifies every key across two snapshots: `insert` (new side only),
    * `delete` (old side only), `update` (both, any compared column
    * differs), `unchanged` otherwise. Presence is tracked with explicit
    * marker columns, so legitimately-null compared columns never
    * misclassify. Returns `keyCols` + `change_type`; callers filter
    * `unchanged` when they want the change stream only. */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
      keyCols: Seq[String], compareCols: Seq[String]): DataFrame = {
    val o = oldSnap.select(keyCols.map(col) ++
      compareCols.map(c => col(c).as(s"o_$c")): _*)
      .withColumn("_in_old", lit(true))
    val n = newSnap.select(keyCols.map(col) ++
      compareCols.map(c => col(c).as(s"n_$c")): _*)
      .withColumn("_in_new", lit(true))
    val same = compareCols.map(c => col(s"o_$c") <=> col(s"n_$c"))
      .reduceOption(_ && _).getOrElse(lit(true))
    o.join(n, keyCols, "full_outer")
      .select(keyCols.map(col) :+
        when(!coalesce(col("_in_old"), lit(false)), lit("insert"))
          .when(!coalesce(col("_in_new"), lit(false)), lit("delete"))
          .when(same, lit("unchanged"))
          .otherwise(lit("update")).as("change_type"): _*)
  }
}
