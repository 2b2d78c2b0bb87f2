package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (SURVEY §2.3 J3): for each left row, the most recent right
  * row with the same key and right.time <= left.time.
  *
  * Implemented as the union-and-carry pattern rather than a range join:
  * tag both inputs, sort each key's rows by (time, side, tiebreak) in one
  * shuffle, and carry the latest right row forward with last_value(...,
  * ignoreNulls). A range join materializes |left| × |matching rights|
  * intermediate rows before its keep-latest window; this stays O(n log n)
  * per key partition and does exactly one exchange — the shape that
  * survives 100 TB (skewed keys permitting — salt the key first if one
  * user dominates).
  *
  * Tie rules: a right row at exactly left.time matches (<=); among right
  * rows with equal time the greatest tiebreak wins — same determinism
  * contract as the windowed formulation.
  */
object AsOf {

  /** @param left      rows to enrich
    * @param right     rows looked up as-of
    * @param key       join key column name present on both sides
    * @param leftTime  event-time column on left
    * @param rightTime event-time column on right
    * @param rightTiebreak column on right breaking equal-time ties (max wins)
    * @param carried   right columns to attach to left rows
    */
  def joinLatest(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      rightTiebreak: String,
      carried: Seq[String]): DataFrame = {

    val leftCols = left.columns
    // Range-join parity for NULLs: a right row with NULL key or NULL time
    // can never satisfy `r.key = l.key AND r.time <= l.time`, so it must
    // not be carried — drop such rows up front. (Left rows with NULL key
    // then simply find no right rows in their partition → NULL carry,
    // matching the join.) Side 0 = right (sorts before left at equal
    // time → inclusive <=).
    val taggedRight = right
      .filter(col(key).isNotNull && col(rightTime).isNotNull)
      .select(
        col(key).as("__k"), col(rightTime).as("__t"), lit(0).as("__side"),
        col(rightTiebreak).as("__tb"),
        // carry the MATCHED ROW as one struct: carrying columns
        // independently with per-column ignoreNulls would stitch values
        // from different right rows whenever the true match holds a NULL
        struct(carried.map(col): _*).as("__r"))
    val taggedLeft = left.select(
      (col(key).as("__k") +: col(leftTime).as("__t") +: lit(1).as("__side") +:
        lit(null).cast(right.schema(rightTiebreak).dataType).as("__tb") +:
        leftCols.map(col)): _*)

    val unioned = taggedLeft.unionByName(
      taggedRight, allowMissingColumns = true)

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc, col("__tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    unioned
      .withColumn("__latest", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        carried.map(c => col(s"__latest.$c").as(c)): _*)
  }
}
