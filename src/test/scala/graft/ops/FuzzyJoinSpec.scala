package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def firstToken = element_at(split(col("name"), " "), 1)

  test("selfPairs: within-block pairs under the threshold, ordered ids") {
    val df = Seq(
      (1L, "blue bolt"), (2L, "blue bolts"),   // dist 1, same block
      (3L, "blue gear"),                        // dist 4 from bolt: cut at 2
      (4L, "red bolt")                          // other block: never compared
    ).toDF("id", "name")
    val out = FuzzyJoin.selfPairs(df, "id", "name", firstToken, maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(out.toSeq === Seq((1L, 2L, 1)))
  }

  test("selfPairs: maxDist 0 finds exact duplicates only") {
    val df = Seq(
      (1L, "hot gear"), (2L, "hot gear"), (3L, "hot gears")
    ).toDF("id", "name")
    val out = FuzzyJoin.selfPairs(df, "id", "name", firstToken, maxDist = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq === Seq((1L, 2L)))
  }

  test("selfPairs: oversized blocks are dropped before the join") {
    val big = (1L to 50L).map(i => (i, s"junk item$i"))
    val small = Seq((100L, "fine part"), (101L, "fine park"))
    val df = (big ++ small).toDF("id", "name")
    val out = FuzzyJoin.selfPairs(df, "id", "name", firstToken,
      maxDist = 10, maxBlockSize = 10)
    // the 50-member "junk" block is capped away; the small block survives
    val pairs = out.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq === Seq((100L, 101L)))
  }

  test("selfPairs matches an unblocked quadratic reference within one block") {
    val names = Seq("small ring", "small ring", "small rings", "small king",
      "small thing", "small gizmo")
    val df = names.zipWithIndex.map { case (n, i) => (i.toLong, n) }.toDF("id", "name")
    val got = FuzzyJoin.selfPairs(df, "id", "name", firstToken, maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val ref = (for {
      i <- names.indices; j <- names.indices if i < j
      d = levenshteinRef(names(i), names(j)) if d <= 2
    } yield (i.toLong, j.toLong, d)).toSet
    assert(got === ref)
  }

  /** textbook DP edit distance for the reference check */
  private def levenshteinRef(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    dp(a.length)(b.length)
  }
}
