package graft

import org.apache.spark.sql.execution.TakeOrderedAndProjectExec

class SortsSetOpsSpec extends SparkSpec {

  test("topk plans as TakeOrderedAndProject (no full sort)") {
    val df = graft.operators.SortsSetOps.topk(spark, sf)
    val plan = df.queryExecution.executedPlan
    assert(plan.collect { case t: TakeOrderedAndProjectExec => t }.nonEmpty,
      s"expected TakeOrderedAndProject, got:\n$plan")
  }

  test("topk returns the 10 highest-balance customers in order") {
    val rows = graft.operators.SortsSetOps.topk(spark, sf).collect()
    assert(rows.length == 10)
    val bals = rows.map(_.getDouble(2))
    assert(bals.sameElements(bals.sortBy(-_: Double)))
  }

  test("set ops agree with manual reference on sf0.001") {
    import spark.implicits._
    val union = graft.operators.SortsSetOps.setUnionAll(spark, sf).count()
    assert(union == 1500 + 150) // orders + customer rows
    val unionD = graft.operators.SortsSetOps.setUnionDistinct(spark, sf)
      .as[Long].collect().toSet
    val inter = graft.operators.SortsSetOps.setIntersect(spark, sf)
      .as[Long].collect().toSet
    val except = graft.operators.SortsSetOps.setExcept(spark, sf)
      .as[Long].collect().toSet
    // every intersect key is in the union; except ∩ intersect = ∅
    assert(inter.subsetOf(unionD))
    assert(except.intersect(inter).isEmpty)
  }
}
