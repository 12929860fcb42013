package graft.operators

import graft.SparkSpec

/** Property tests for [[CorpusBudget.waterFill]]: the distributed
  * window-function formulation must agree with a plain-Scala reference
  * implementation of water filling over seeded random (avail, budget)
  * instances, and the allocation must satisfy the defining invariants:
  * never exceed a domain's availability, never exceed the budget (when
  * feasible), saturate exactly the domains at-or-below the water
  * level, and be λ-optimal (raising the level by 1 would bust the
  * budget).
  */
class CorpusBudgetSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference: sort ascending, walk until the candidate
    * level fits (same integer floor-division semantics).
    */
  private def reference(avails: Seq[(String, Long)],
      budget: Long): Map[String, (Long, Long)] = {
    val sorted = avails.sortBy { case (k, a) => (a, k) }
    val n = sorted.size
    var pa = 0L
    var lam: Option[Long] = None
    var i = 0
    while (i < n && lam.isEmpty) {
      val cand = (budget - pa) / (n - i)
      if (cand <= sorted(i)._2) lam = Some(cand)
      else { pa += sorted(i)._2; i += 1 }
    }
    avails.map { case (k, a) =>
      val alloc = lam match {
        case Some(l) if a > l => l
        case _ => a
      }
      k -> (alloc, if (alloc == a) 1L else 0L)
    }.toMap
  }

  test("waterFill equals the reference and satisfies the invariants over random instances") {
    for (seed <- 1L to 10L) {
      val rnd = new scala.util.Random(seed)
      val n = 1 + rnd.nextInt(40)
      val avails = (0 until n).map(i =>
        (f"d$i%03d", 1L + rnd.nextInt(5000).toLong))
      val total = avails.map(_._2).sum
      // budgets spanning scarce, partial, and surplus regimes
      for (budget <- Seq(total / 10 max 1, total / 2 max 1, total, total * 2)) {
        val got = CorpusBudget
          .waterFill(avails.toDF("source", "avail"), "source", "avail", budget)
          .as[(String, Long, Long, Long)].collect()
          .map { case (k, _, alloc, sat) => k -> (alloc, sat) }.toMap
        val want = reference(avails, budget)
        assert(got == want, s"seed=$seed budget=$budget")
        // invariants, independent of the reference
        val allocs = avails.map { case (k, a) => (a, got(k)._1) }
        assert(allocs.forall { case (a, al) => al <= a && al >= 0 },
          s"alloc within availability (seed=$seed budget=$budget)")
        val sumAlloc = allocs.map(_._2).sum
        if (budget >= total)
          assert(sumAlloc == total, "surplus budget takes everything")
        else {
          assert(sumAlloc <= budget, "never overspend")
          // λ-optimality: one more unit of water level busts the budget
          val lam = allocs.collect { case (a, al) if al < a => al }
            .headOption
          lam.foreach { l =>
            val bumped = avails.map { case (_, a) => math.min(a, l + 1) }.sum
            assert(bumped > budget,
              s"water level must be maximal (seed=$seed budget=$budget)")
          }
        }
      }
    }
  }

  test("empty input yields an empty allocation") {
    val out = CorpusBudget.waterFill(
      Seq.empty[(String, Long)].toDF("source", "avail"),
      "source", "avail", 100L)
    assert(out.count() == 0)
  }
}
