package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Reference semantics (src/other/create_category_group_messages.py:61-84):
  * first group whose running total stays <= cap; else first empty group;
  * else the least-loaded group with ties to the LAST minimum.
  */
class BinPackingSpec extends AnyFunSuite with Matchers {

  test("first-fit under cap") {
    val out = BinPacking.pack(Seq(("a", 3000L), ("b", 3000L), ("c", 3000L)), numGroups = 2, cap = 7000L)
    out.map(_.group) shouldBe Seq(0, 0, 1) // a+b fit group 0, c overflows to 1
  }

  test("oversized item takes first empty group") {
    val out = BinPacking.pack(Seq(("a", 1L), ("big", 9999L)), numGroups = 3, cap = 7000L)
    out.find(_.id == "big").get.group shouldBe 1 // group 0 occupied, 1 empty
  }

  test("all full: least-loaded wins, tie to last minimum") {
    // both groups loaded 8000 -> tie -> last minimum (group 1)
    val out = BinPacking.pack(
      Seq(("a", 8000L), ("b", 8000L), ("c", 10L)), numGroups = 2, cap = 7000L)
    out.map(_.group) shouldBe Seq(0, 1, 1)
  }

  test("property: weight conservation, group bounds, order preserved") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 200) {
      val items = Seq.fill(rnd.nextInt(200))((rnd.nextInt(1000).toString, rnd.nextLong(10000)))
      val out = BinPacking.pack(items, numGroups = 25, cap = 7000L)
      out.map(_.weight).sum shouldBe items.map(_._2).sum
      all(out.map(_.group)) should (be >= 0 and be < 25)
      out.map(_.id) shouldBe items.map(_._1)
    }
  }

  test("cap respected while any group has headroom") {
    val items = (1 to 50).map(i => (s"i$i", 1000L))
    val out = BinPacking.pack(items, numGroups = 25, cap = 7000L)
    out.groupBy(_.group).values.map(_.map(_.weight).sum).max should be <= 7000L
  }
}
