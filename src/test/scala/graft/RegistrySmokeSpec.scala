package graft

/** Full-registry smoke: every `SparkEntry.queries` entry must at least
  * analyze + execute against the real sf0.001 testdata. This is the guard
  * that would have caught the r8 TIMESTAMP_NTZ regression at build time —
  * 10 queries shipped broken because only the flagship query was smoked.
  *
  * `count()` (not `collect()`) keeps it cheap; an analysis error, a missing
  * column, or a runtime cast failure all surface as a thrown exception here.
  */
class RegistrySmokeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("registry is non-trivial") {
    assert(SparkEntry.queries.size >= 261,
      s"registry shrank to ${SparkEntry.queries.size} queries")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, q) =>
    test(s"registry smoke: $name executes on sf0.001") {
      val df = q(spark, dir)
      val n = df.count()
      assert(n >= 0L, s"$name returned negative count")
    }
  }

  test("every oracleSql key has a queries entry (no orphan oracles)") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql keys without queries: $orphans")
  }
}
