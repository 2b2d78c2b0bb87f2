package graft

/** Guards on the driver contract: naming, oracle coverage, and schema
  * stability of the query inventory. */
class InventorySpec extends SparkTestBase {

  test("every query is named qNN_* and every oracle key has a query") {
    val qs = SparkEntry.queries
    assert(qs.nonEmpty)
    assert(qs.keys.forall(_.matches("q\\d+_[a-z0-9_]+")), qs.keys.toSeq.sorted)
    val orphans = SparkEntry.oracleSql.keySet -- qs.keySet
    assert(orphans.isEmpty, s"oracle without query: $orphans")
  }

  test("oracle coverage: every declared query is oracle-gated") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly.isEmpty, s"unexpected rows-only queries: $rowsOnly")
  }

  test("every query builds and keeps a stable schema across two builds (sf0.001)") {
    val d = "/root/testdata/sf0.001"
    SparkEntry.queries.foreach { case (name, fn) =>
      val a = fn(spark, d).schema
      val b = fn(spark, d).schema
      assert(a === b, s"$name schema unstable")
      assert(a.fieldNames.distinct.length === a.fieldNames.length,
        s"$name has duplicate column names")
    }
  }

  test("no query output column is array/map/struct (driver compare contract)") {
    // the driver's correctness gate sorts result rows with pandas, which
    // cannot hash/sort a numpy-array cell — q137 was red a whole round
    // for exactly this. House pattern: ship arrays as array_join'd
    // strings (q55/q65/q137) or fingerprints. Top-level output columns
    // must stay atomic.
    val d = "/root/testdata/sf0.001"
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    SparkEntry.queries.foreach { case (name, fn) =>
      val bad = fn(spark, d).schema.fields.filter(f => f.dataType match {
        case _: ArrayType | _: MapType | _: StructType => true
        case _ => false
      })
      assert(bad.isEmpty,
        s"$name emits non-atomic column(s) ${bad.map(_.name).mkString(",")}" +
          " — the driver's pandas compare cannot sort these; array_join" +
          " or fingerprint them (q55 pattern)")
    }
  }

  test("entry returns rows (driver t1 smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("no query plans a CartesianProduct (suite-wide anti-pattern net)") {
    // every crossJoin in the engine broadcasts a tiny frame (centroids,
    // 1-row counts/sketches) and must plan as BroadcastNestedLoopJoin —
    // a CartesianProduct anywhere means a corpus×corpus blowup at scale.
    // Planning only; nothing executes.
    val d = "/root/testdata/sf0.001"
    SparkEntry.queries.foreach { case (name, fn) =>
      val plan = fn(spark, d).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a CartesianProduct")
    }
  }
}
