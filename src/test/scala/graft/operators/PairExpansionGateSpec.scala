package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The CLASS GATE for within-group pair expansions (the r11 verdict's
  * stretch item): every same-frame self-join that expands groups into
  * member pairs is quadratic in the largest group, so each site must
  * either take an ENFORCED cap (with an exact refusal ledger) or be
  * registered here with its boundedness justification. Two layers:
  *
  *  1. a SOURCE SCAN pins every file containing the self-join idiom
  *     (`X.as("a").join(X.as("b")`, the codebase's only way to write
  *     one) to a registry with per-file site counts — a NEW expansion
  *     site fails this gate until it is capped or justified;
  *  2. BEHAVIOR tests prove the shared kernel ([[Pairs.capGroups]])
  *     refuses oversized groups exactly. (Per-operator planted-hub
  *     tests live with their operators: RecommendSpec B54,
  *     AssociationsSpec C139/C146, GraphSpec C107/C111 hub caps,
  *     DedupSpec C140 document-frequency cap.)
  */
class PairExpansionGateSpec extends SparkSuite {
  import spark.implicits._

  // file → (expected self-join site count, cap-or-justification)
  private val registry: Map[String, (Int, String)] = Map(
    "operators/Recommend.scala" -> (1,
      "capped: Pairs.capGroups(maxBasketSize) + in-band ledger (B54)"),
    "operators/Associations.scala" -> (2,
      "capped: Pairs.capGroups(maxBasketSize/maxSessionSize) + in-band ledger (C139/C146)"),
    "operators/Dedup.scala" -> (2,
      "capped: winnowingPairs maxDocFreq (MOSS rule, C140); " +
        "whitelisted: exactJaccardJoin — the ppjoin prefix filter bounds " +
        "candidates by the similarity threshold itself, and prefixes rank " +
        "shingles by ASCENDING corpus frequency, so ubiquitous shingles " +
        "sit outside every prefix (C125)"),
    "operators/Hierarchy.scala" -> (1,
      "whitelisted: path-doubling transitive closure joins anc===node " +
        "(composition, not a within-group pair expansion) — the frame is " +
        "the CLOSURE itself, so work is output-proportional (Σ depths), " +
        "bounded by the forest/unique-path-DAG contract and maxIter"),
    "queries/TrainingData.scala" -> (1,
      "capped: the single copurchasePairCounts helper routes every " +
        "co-purchase query shape through Pairs.capGroups(1024)"),
    "tools/ScaleProbe.scala" -> (4,
      "whitelisted: probe harness — expansions run on bounded synthetic " +
        "replicas of the TPC-H order frame (≤7 members per group by the " +
        "data model), never on unbounded input")
  )

  test("gate: every self-join pair-expansion site is registered (capped or justified)") {
    val root = java.nio.file.Paths.get("src/main/scala/graft")
    val idiom = """\.as\("[a-z0-9]+"\)\s*\.join\(""".r
    val found = scala.collection.mutable.Map.empty[String, Int]
    java.nio.file.Files.walk(root).forEach { p =>
      if (p.toString.endsWith(".scala")) {
        val text = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
        val n = idiom.findAllIn(text).size
        if (n > 0) {
          val rel = root.relativize(p).toString
          found(rel) = n
        }
      }
    }
    val missing = found.keySet -- registry.keySet
    assert(missing.isEmpty,
      s"UNREGISTERED pair-expansion site(s): $missing — cap the expansion " +
        "(Pairs.capGroups or an operator-level cap with an exact ledger) " +
        "or register the boundedness justification in PairExpansionGateSpec")
    registry.foreach { case (f, (n, why)) =>
      assert(found.get(f).contains(n),
        s"$f: expected $n self-join site(s) (${why}), found ${found.get(f)} — " +
          "re-audit the file's expansions and update the registry")
    }
  }

  test("kernel: Pairs.capGroups refuses oversized groups whole with an exact ledger") {
    val gm = ((1L to 5L).map(i => ("g1", i)) ++          // size 5 — refused at cap 4
      (1L to 4L).map(i => ("g2", i)) ++                  // size 4 — kept
      Seq(("g3", 1L))).toDF("g", "m")                    // size 1 — kept
    val (kept, ledger) = Pairs.capGroups(gm, "g", maxGroupSize = 4L)
    assert(kept.select("g").distinct().as[String].collect().toSet == Set("g2", "g3"))
    assert(kept.count() == 5L)
    val l = ledger.select(col("n_groups_capped"),
        col("pairs_dropped_dec").cast("long")).as[(Long, Long)].head()
    assert(l == ((1L, 20L)), s"ledger: $l") // 5·4 directed pairs refused
    // no refusal → zero ledger, frame untouched
    val (k2, l2) = Pairs.capGroups(gm, "g", maxGroupSize = 5L)
    assert(k2.count() == gm.count())
    assert(l2.select(col("n_groups_capped"),
      col("pairs_dropped_dec").cast("long")).as[(Long, Long)].head() == ((0L, 0L)))
    // the cap must allow at least one pair
    intercept[IllegalArgumentException](Pairs.capGroups(gm, "g", 1L))
  }
}
