package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** C149: HRW sharding must satisfy the structural minimal-movement
  * laws mod-N cannot: growing n → n+1 moves keys ONLY into the new
  * shard (existing pairwise ranks are untouched), shrinking moves only
  * the removed shard's residents, the moved fraction sits near 1/(n+1),
  * assignment is deterministic and balanced. */
class ShardingSpec extends SparkSuite {
  import spark.implicits._

  private val keys = (1L to 4000L).toDF("k")

  test("C149: grow moves keys only INTO the new shard; shrink only OUT of it") {
    val grow = Sharding.reshardAudit(keys, col("k"), n = 8, m = 9)
      .as[(Long, Long, Long, Boolean, Long)].collect()
    assert(grow.filter(_._4).forall(_._2 == 8L),
      "every moved key lands on the new shard 8")
    val movedPpm = grow.filter(_._4).map(_._5).sum
    assert(movedPpm > 60000 && movedPpm < 170000,
      s"moved fraction near 1/9: $movedPpm ppm")
    val shrink = Sharding.reshardAudit(keys, col("k"), n = 9, m = 8)
      .as[(Long, Long, Long, Boolean, Long)].collect()
    assert(shrink.filter(_._4).forall(_._1 == 8L),
      "only the removed shard's residents move")
  }

  test("C149: assignment is deterministic, in-range and balanced") {
    val a1 = Sharding.hrwAssign(keys, col("k"), n = 7)
      .select("k", "shard").as[(Long, Long)].collect().toMap
    val a2 = Sharding.hrwAssign(keys, col("k"), n = 7)
      .select("k", "shard").as[(Long, Long)].collect().toMap
    assert(a1 == a2, "stable under re-evaluation")
    assert(a1.values.forall(s => s >= 0 && s < 7))
    val sizes = a1.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(sizes.size == 7 && sizes.values.min > 4000 / 7 / 2,
      s"roughly balanced: $sizes")
  }
}
