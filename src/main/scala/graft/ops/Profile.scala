package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Exprs.round2

/** ONE-PASS per-column data profiling — the data-quality monitor a corpus
  * ingest runs before anything else touches the batch: row count, null
  * count, exact distinct count, and min/max/mean rendered-length per
  * column, one output row per column.
  *
  * Scale shape: a single aggregate over the table produces every stat in
  * one scan; the per-column rows come from `stack` over that ONE result
  * row (driver-sized — #columns, never data). The only multiplier is the
  * Expand that Spark plans for multiple DISTINCT aggregates: one
  * projection per distinct column, i.e. input×(cols+1) rows into the
  * partial aggregate — but the distinct values being shuffled are 32-char
  * md5 DIGESTS of the rendered values, never the values themselves, so a
  * 100 TB text column shuffles bounded-width keys (the [[graft.ext.TextOps.corpusCard]]
  * digest-distinct discipline; md5 equality ≡ value equality at any
  * realistic scale, and BOTH engines count the same digests, so the hash
  * gate stays exact by construction).
  *
  * Length stats are over the value's STRING RENDERING (`CAST(x AS
  * VARCHAR)` — identical in Spark and DuckDB for integral and string
  * types), which gives one uniform, engine-exact length domain across
  * mixed column types. Callers with float/timestamp columns should cast
  * or format them first (rendering is not engine-stable for those).
  */
object Profile {

  /** Column inventory shared by the Spark plan and the generated oracle
    * mirror — single source of truth for `q_profile_docs`. */
  val DocumentCols: Seq[String] =
    Seq("doc_id", "text", "lang", "source", "n_chars")

  def columnProfile(df: DataFrame): DataFrame =
    profileCore(df, c => countDistinct(md5(c.cast("string"))))

  /** The 100 TB SCALE PATH: identical schema, HLL-approximate distincts.
    * [[columnProfile]]'s exact multi-DISTINCT plans an Expand — input ×
    * (cols+1) rows into the partial aggregate; this variant replaces the
    * distincts with `approx_count_distinct` sketches, so the whole
    * profile is ONE pass with NO row multiplication (every stat partials
    * map-side, one single-row shuffle). The exact form rides the hash
    * gate; this one is spec-bound to it within HLL error (the
    * price_quantiles / dau_approx exact-vs-sketch pairing). */
  def columnProfileApprox(df: DataFrame, rsd: Double = 0.02): DataFrame =
    profileCore(df, c => approx_count_distinct(c, rsd))

  /** Shared body: one aggregate + stack; `ndAgg` is the ONLY divergence
    * between the exact (digest-distinct) and approximate (HLL) paths, so
    * the two stay in lockstep with each other and with the generated
    * [[profileSql]] mirror. */
  private def profileCore(df: DataFrame,
      ndAgg: org.apache.spark.sql.Column => org.apache.spark.sql.Column)
      : DataFrame = {
    val cols = df.schema.fieldNames.toSeq
    val aggs = cols.flatMap { c =>
      val len = length(col(c).cast("string"))
      Seq(
        count(col(c)).as(s"${c}__nn"),
        ndAgg(col(c)).as(s"${c}__nd"),
        min(len).as(s"${c}__mnl"),
        max(len).as(s"${c}__mxl"),
        sum(len.cast("long")).as(s"${c}__sl"))
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val stacked = cols.map(c =>
      s"'$c', `${c}__nn`, `${c}__nd`, `${c}__mnl`, `${c}__mxl`, `${c}__sl`")
      .mkString(", ")
    one
      .selectExpr("__n", s"stack(${cols.length}, $stacked) AS " +
        "(col_name, nn, n_distinct, min_len, max_len, sum_len)")
      .select(col("col_name"),
        col("__n").as("n_rows"),
        (col("__n") - col("nn")).as("n_nulls"),
        col("n_distinct"),
        col("min_len"), col("max_len"),
        round2(col("sum_len").cast("double") / col("nn"), 2).as("avg_len"))
      .orderBy("col_name")
  }

  /** DuckDB mirror generated from the same column list: one aggregate
    * SELECT per column UNION ALL'd (DuckDB's planner scans once). */
  def profileSql(table: String, cols: Seq[String]): String =
    cols.map { c =>
      val len = s"length(CAST($c AS VARCHAR))"
      s"""SELECT '$c' AS col_name,
         |  CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(count(*) - count($c) AS BIGINT) AS n_nulls,
         |  CAST(count(DISTINCT md5(CAST($c AS VARCHAR))) AS BIGINT)
         |    AS n_distinct,
         |  CAST(min($len) AS INT) AS min_len,
         |  CAST(max($len) AS INT) AS max_len,
         |  ${graft.Exprs.round2Sql(s"sum($len) * 1.0 / count($c)")} AS avg_len
         |FROM $table""".stripMargin
    }.mkString("\nUNION ALL\n") + "\nORDER BY col_name"
}
