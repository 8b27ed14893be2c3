package graft.operators

import graft.SparkSpec

/** Min-label propagation must find exact components on shapes that need
  * more than one round (chains) and keep disjoint clusters apart. */
class ConnectedComponentsSpec extends SparkSpec {

  test("empty pair set yields an empty labeling, not an NPE") {
    val s = spark
    import s.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(ConnectedComponents.components(empty, "id_a", "id_b").count() == 0L)
  }

  test("chain, triangle and isolated pair resolve to min-id components") {
    val s = spark
    import s.implicits._
    // component A: chain 1-2-3-4 (diameter 3 -> multiple propagation rounds)
    // component B: triangle 10-11-12 plus pendant 13
    // component C: isolated pair 20-21
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L), (12L, 13L),
      (20L, 21L))
      .toDF("id_a", "id_b")
    val got = ConnectedComponents.components(pairs, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("long chain (diameter past JumpFromRound) engages pointer jumping " +
       "and still resolves to the min id") {
    val s = spark
    import s.implicits._
    // diameter 24 >> JumpFromRound: rounds 1-3 are propagate-only, every
    // later round includes the path-halving jump — this is the pathological
    // shape the adaptive switch exists for, and it must stay exact
    val n = 24L
    val pairs = (0L until n).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = ConnectedComponents.components(pairs, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (0L to n).map(_ -> 0L).toMap)
  }
}
