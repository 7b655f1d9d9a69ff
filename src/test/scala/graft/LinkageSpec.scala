package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Linkage

class LinkageSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  test("blockedFuzzyJoin matches within blocks, exact distances") {
    val clean = Seq(
      (1L, "john smith"), (2L, "jane smith"), (3L, "bob stone"),
      (4L, "ann brown")
    ).toDF("id", "name")
    val dirty = Seq(
      (11L, "john smith"),  // exact: dist 0 to 1 (block "mith")
      (12L, "jene smith"),  // 1 sub from jane: dist 1 to 2
      (13L, "bob stone!"),  // suffix edit moves the block key: LOST
      (14L, "anne brown")   // 1 insert from ann: dist 1 to 4
    ).toDF("id", "name")
    val got = Linkage.blockedFuzzyJoin(dirty, "id", "name",
        clean, "id", "name", Linkage.suffixKey(4), maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    // jene smith is dist 1 to BOTH smiths? no — "john"→"jene" is 2
    // subs; only jane verifies. bob stone! demonstrates the recall
    // bound: the edit hit the suffix key, so the pair never forms.
    assert(got == Set((11L, 1L, 0L), (12L, 2L, 1L), (14L, 4L, 1L)))
  }
}
