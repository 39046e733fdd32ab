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
      keyCols: Seq[String], compareCols: Seq[String]): DataFrame =
    diffed(oldSnap, newSnap, keyCols, compareCols)
      .select((keyCols :+ "change_type").map(col): _*)

  /** [[snapshotDiff]] carrying the APPLYABLE payload: each change row also
    * holds the new-side values of `compareCols` (null for a `delete` — the
    * payload of a deletion is the absence). `unchanged` keys are dropped:
    * this is the wire format, and at snapshot scale the unchanged majority
    * is exactly what must not ship. Feed the result to [[applyChanges]]. */
  def snapshotChanges(oldSnap: DataFrame, newSnap: DataFrame,
      keyCols: Seq[String], compareCols: Seq[String]): DataFrame =
    diffed(oldSnap, newSnap, keyCols, compareCols)
      .filter(col("change_type") =!= "unchanged")
      .select(keyCols.map(col) ++ (col("change_type") +:
        compareCols.map(c => col(s"n_$c").as(c))): _*)

  /** Applies a [[snapshotChanges]] stream to a snapshot, reconstructing
    * the successor snapshot: `delete`/`update` keys leave the old image
    * (one left ANTI join on the key), `insert`/`update` payloads enter
    * from the change stream (a union — no second join). Cost is one
    * key-shuffle of the snapshot against the (delta-sized) change set;
    * AQE broadcasts the change side when it is small, which is the normal
    * case at 100 TB (daily churn ≪ table).
    *
    * Round-trip law, certified by the driver's hash gate (`q_cdc_apply`
    * mirrors the NEW snapshot's definition directly):
    * `applyChanges(old, snapshotChanges(old, new)) ≡ new` row-for-row. */
  def applyChanges(oldSnap: DataFrame, changes: DataFrame,
      keyCols: Seq[String], payloadCols: Seq[String]): DataFrame = {
    val cols = (keyCols ++ payloadCols).map(col)
    val touched = changes
      .filter(col("change_type").isin("delete", "update"))
      .select(keyCols.map(col): _*)
    oldSnap.select(cols: _*)
      .join(touched, keyCols, "left_anti")
      .unionByName(changes
        .filter(col("change_type").isin("insert", "update"))
        .select(cols: _*))
  }

  /** The shared full-outer diff: keys + `o_`/`n_`-prefixed images +
    * `change_type` for every key present in either snapshot. */
  private def diffed(oldSnap: DataFrame, newSnap: DataFrame,
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
      .withColumn("change_type",
        when(!coalesce(col("_in_old"), lit(false)), lit("insert"))
          .when(!coalesce(col("_in_new"), lit(false)), lit("delete"))
          .when(same, lit("unchanged"))
          .otherwise(lit("update")))
  }
}
