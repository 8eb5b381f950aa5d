package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Salted join: result-equivalence with the plain join on a skewed fixture,
  * salt spread on the hot key, and left-outer preservation. */
class SkewSpec extends SparkSuite {
  import spark.implicits._

  // one pathological key (0) with 5000 rows, a long tail of singletons
  private lazy val facts = ((1 to 5000).map(i => (0L, i.toLong)) ++
    (1 to 200).map(i => (i.toLong, i.toLong * 10))).toDF("k", "v")
  private lazy val dims = ((0 to 150).map(i => (i.toLong, s"d$i"))).toDF("k", "name")

  test("salted inner join equals the plain join exactly") {
    val plain = facts.join(dims, Seq("k")).select("k", "v", "name")
    val salted = Skew.saltedJoin(facts, dims, Seq("k"), salts = 8).select("k", "v", "name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salted left join preserves unmatched skewed-side rows") {
    val salted = Skew.saltedJoin(facts, dims, Seq("k"), salts = 8, joinType = "left")
    assert(salted.count() == facts.count())
    assert(salted.filter(col("name").isNull).select("k").distinct().count() == 50) // keys 151..200
  }

  test("the hot key actually spreads across salt buckets") {
    val spread = facts.filter(col("k") === 0)
      .withColumn("__salt", pmod(xxhash64(facts.columns.map(col): _*), lit(8L)))
      .select("__salt").distinct().count()
    assert(spread == 8, s"hot key should hit all 8 salt buckets, got $spread")
  }

  test("keyProfile surfaces the hot key with its exact share") {
    // facts: key 0 is hot (the fixture's whole point); profile must rank it
    // first and the share arithmetic must be exact
    val prof = Skew.keyProfile(facts, "k", topK = 3)
      .select("key", "n", "total_rows", "share")
      .as[(String, Long, Long, Double)].collect()
    assert(prof.length == 3)
    val top = prof.head
    assert(top._1 == "0", "hot key ranks first")
    assert(prof.sliding(2).forall(p => p(0)._2 >= p(1)._2), "descending by count")
    assert(top._4 == top._2.toDouble / top._3, "share is the exact division")
    assert(top._4 > prof(1)._4 * 5, "fixture's hot key dominates")
  }
}
