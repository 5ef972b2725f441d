package graft.ops

import graft.SparkTestBase

/** Plan-quality gates (the 100 TB checklist): filters reach the
  * parquet scan, projections prune columns, small dims broadcast, and
  * the hot paths stay inside whole-stage codegen. These assert on
  * `explain(formatted)` text so a regression in plan shape fails CI,
  * not just a benchmark. */
class PlanSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String = {
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) { df.explain("formatted") }
    out.toString
  }

  test("substring filter is pushed into the parquet scan") {
    val p = plan(Relational.substringFilter(spark, dir))
    assert(p.contains("PushedFilters"), p)
    // contains() compiles to a pushable StringContains filter
    assert(p.contains("StringContains") || p.contains("*Contains*") || p.contains("ur"), p)
  }

  test("q1 scan prunes to the referenced columns only, partial agg before shuffle") {
    val p = plan(Relational.q1Agg(spark, dir))
    assert(p.contains("ReadSchema: struct<l_quantity:double,l_returnflag:string>"),
      "scan not pruned to 2 columns:\n" + p)
    assert(p.contains("partial_sum"), "no map-side combine:\n" + p)
  }

  test("dimension join broadcasts the small side") {
    val p = plan(Relational.broadcastJoin(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("anti-join compiles to a hash anti join, filter pushed to orders scan") {
    val p = plan(Relational.antiJoin(spark, dir))
    assert(p.contains("LeftAnti"), p)
    assert(p.contains("GreaterThan(o_totalprice"), p)
  }

  test("admission window partitions by user and stays codegen'd around the window") {
    val p = plan(Relational.budgetAdmission(spark, dir))
    assert(p.contains("Window"), p)
    // partial aggregation before the final count (map-side combine)
    assert(p.contains("HashAggregate"), p)
  }

  test("token count runs scan->project with no shuffle at all") {
    val p = plan(TextOps.tokenCount(spark, dir))
    assert(!p.contains("Exchange"), "unexpected shuffle:\n" + p)
  }

  test("exact dedup is a single hash-shuffle with partial aggregation") {
    val p = plan(Dedup.exactDedup(spark, dir))
    // formatted explain prints each node once in the tree and once in the
    // detail list — count the numbered detail headers
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(p).size
    assert(exchanges == 1, s"expected exactly 1 shuffle, got $exchanges:\n" + p)
    assert(p.contains("partial_"), "no map-side combine:\n" + p)
  }
}
