package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver's smoke contract: entry(spark) must yield rows > 0. */
class EntrySpec extends AnyFunSuite {
  test("SparkEntry.entry returns rows on sf0.001") {
    val df = SparkEntry.entry(SparkTestBase.spark)
    assert(df.count() > 0)
    assert(df.columns.contains("image_id") && df.columns.contains("poly_id"))
  }

  test("driver contract: every oracle key names a query; counts as documented") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"orphan oracles: ${os diff qs}")
    assert(qs.size == 94 && os.size == 93, s"${qs.size} queries / ${os.size} oracles")
    // the one remaining rows-only query (dictionary-vote lang-ID — the
    // documented irreducible; q24/q25 gained full SQL replays in round 6)
    assert((qs diff os) == Set("q33_text_fingerprints"))
  }
}
