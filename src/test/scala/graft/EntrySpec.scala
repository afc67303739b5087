package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver's smoke contract: entry(spark) must yield rows > 0. */
class EntrySpec extends AnyFunSuite {
  test("SparkEntry.entry returns rows on sf0.001") {
    val df = SparkEntry.entry(SparkTestBase.spark)
    assert(df.count() > 0)
    assert(df.columns.contains("image_id") && df.columns.contains("poly_id"))
  }
}
