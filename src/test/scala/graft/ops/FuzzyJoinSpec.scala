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

  /** Brute-force word-n-gram Jaccard over a tiny corpus. */
  private def bruteJaccard(docs: Seq[(Long, String)], n: Int)
      : Map[(Long, Long), Double] = {
    def sh(s: String): Set[Seq[String]] =
      s.split("\\s+").toSeq.sliding(n).filter(_.size == n).toSet
    (for {
      (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
      a = sh(ta); b = sh(tb) if a.nonEmpty || b.nonEmpty
      i = (a intersect b).size if i > 0
    } yield (ia, ib) -> i.toDouble / (a.size + b.size - i)).toMap
  }

  test("jaccardSelfJoin matches the quadratic reference exactly") {
    val docs = Seq[(Long, String)](
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "a completely different sentence with other words here"),
      (4L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
      (5L, "quick brown fox jumps over the lazy"),
      (6L, "too short"))
    val got = FuzzyJoin
      .jaccardSelfJoin(docs.toDF("id", "text"), "id", "text",
        n = 3, threshold = 0.4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val want = bruteJaccard(docs, 3).filter(_._2 >= 0.4)
      .map { case (k, v) => k -> (math.rint(v * 1e6) / 1e6) }
    assert(got.keySet === want.keySet, s"got ${got.keySet}")
    want.foreach { case (k, v) => assert(math.abs(got(k) - v) < 1e-9) }
    assert(got((1L, 4L)) === 1.0) // the exact duplicate pair
  }

  test("jaccardSelfJoin: no pair below threshold, none missed at it") {
    // two docs sharing exactly half their shingles: J = 1/3 with n = 2
    // ("a b","b c" vs "a b","b d"): J = 1/3 — kept at t = 1/3, dropped
    // just above
    val docs = Seq[(Long, String)]((1L, "a b c"), (2L, "a b d"))
    val at = FuzzyJoin.jaccardSelfJoin(docs.toDF("id", "text"), "id",
      "text", n = 2, threshold = 1.0 / 3).collect()
    assert(at.length === 1 && math.abs(at(0).getDouble(2) - 0.333333) < 1e-9)
    val above = FuzzyJoin.jaccardSelfJoin(docs.toDF("id", "text"), "id",
      "text", n = 2, threshold = 0.34).collect()
    assert(above.isEmpty)
  }

  test("jaccardSelfJoin fails loudly on a degenerate hot prefix") {
    val docs = (1L to 50L).map(i => (i, "same boilerplate text every time"))
    val ex = intercept[IllegalArgumentException] {
      FuzzyJoin.jaccardSelfJoin(docs.toDF("id", "text"), "id", "text",
        n = 3, threshold = 0.9, maxPrefixPostings = 10).collect()
    }
    assert(ex.getMessage.contains("prefix shingle"))
  }

  test("jaccardSelfJoin is partition-invariant") {
    val docs = (1 to 30).map(i => (i.toLong,
      if (i % 3 == 0) s"shared common phrase body tail$i"
      else s"head$i shared common phrase body"))
    val df = docs.toDF("id", "text")
    val a = FuzzyJoin.jaccardSelfJoin(df, "id", "text", 3, 0.4)
      .orderBy("id_a", "id_b").collect().toSeq
    val b = FuzzyJoin.jaccardSelfJoin(df.repartition(7), "id", "text",
      3, 0.4).orderBy("id_a", "id_b").collect().toSeq
    assert(a === b && a.nonEmpty)
  }

  // --- editDistanceSelfJoin (PassJoin segment filtering) ---

  private def bruteForce(rows: Seq[(Long, String)], d: Int) = {
    def lev(a: String, b: String): Int = {
      val m = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        m(i)(j) = math.min(math.min(m(i - 1)(j) + 1, m(i)(j - 1) + 1),
          m(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      m(a.length)(b.length)
    }
    (for {
      (ia, sa) <- rows; (ib, sb) <- rows if ia < ib
      dist = lev(sa, sb) if dist <= d
    } yield (ia, ib, dist)).sorted
  }

  private def edPairs(rows: Seq[(Long, String)], d: Int) =
    FuzzyJoin.editDistanceSelfJoin(rows.toDF("id", "s"), "id", "s", d)
      .orderBy("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq

  test("editDistanceSelfJoin matches brute force (mixed edits, d=1 and 2)") {
    val rows = Seq(
      1L -> "kitten", 2L -> "sitten", 3L -> "sittin", 4L -> "sitting",
      5L -> "mitten", 6L -> "flour", 7L -> "flower", 8L -> "flowers",
      9L -> "totally unrelated string", 10L -> "kitten"
    )
    assert(edPairs(rows, 1) == bruteForce(rows, 1))
    assert(edPairs(rows, 2) == bruteForce(rows, 2))
  }

  test("editDistanceSelfJoin: short strings (below k chars) are not lost") {
    val rows = Seq(1L -> "a", 2L -> "b", 3L -> "ab", 4L -> "abc",
      5L -> "", 6L -> "abcd", 7L -> "xyz")
    assert(edPairs(rows, 2) == bruteForce(rows, 2))
  }

  test("editDistanceSelfJoin: length-band boundaries are exact") {
    // deletions at segment boundaries are the classic PassJoin trap
    val rows = Seq(1L -> "abcdefgh", 2L -> "abcdfgh", 3L -> "bcdefgh",
      4L -> "abcdefghx", 5L -> "aabcdefgh")
    assert(edPairs(rows, 1) == bruteForce(rows, 1))
  }

  test("editDistanceSelfJoin fails loudly on a degenerate hot segment") {
    val rows = (1L to 60L).map(i => (i, "identical-string"))
    val ex = intercept[IllegalArgumentException] {
      FuzzyJoin.editDistanceSelfJoin(rows.toDF("id", "s"), "id", "s",
        maxDist = 1, maxSegPostings = 10).collect()
    }
    assert(ex.getMessage.contains("segment key"))
  }

  test("editDistanceSelfJoin is partition-invariant") {
    val rows = (1 to 40).map(i => (i.toLong, f"Item#${i / 3}%05d"))
    val df = rows.toDF("id", "s")
    val a = FuzzyJoin.editDistanceSelfJoin(df, "id", "s", 1)
      .orderBy("id_a", "id_b").collect().toSeq
    val b = FuzzyJoin.editDistanceSelfJoin(df.repartition(7), "id", "s", 1)
      .orderBy("id_a", "id_b").collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("containmentSelfJoin catches the subset pair symmetric Jaccard misses") {
    val df = Seq(
      (1L, "x y z"),                 // 2-gram shingles {xy, yz}
      (2L, "x y z p q r s t u v")    // superset: 9 shingles
    ).toDF("id", "text")
    val got = FuzzyJoin.containmentSelfJoin(df, "id", "text", n = 2,
        threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // C(1→2) = 2/2 = 1.0; C(2→1) = 2/9 — only the sub→sup direction
    assert(got.toSeq === Seq((1L, 2L, 1.0)))
    // and symmetric Jaccard at the same threshold finds NOTHING
    assert(FuzzyJoin.jaccardSelfJoin(df, "id", "text", n = 2,
      threshold = 0.8).count() === 0L)
  }

  test("containmentSelfJoin matches brute force on real documents") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    def brute(t: Double): Set[(Long, Long, Double)] = {
      val sh = docs.select(col("doc_id"),
        graft.ops.Dedup.shingleHashExpr(col("text"), 4).as("g"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toSeq
      (for {
        (ia, sa) <- sh; (ib, sb) <- sh
        if ia != ib && sa.nonEmpty
        c = (sa & sb).size.toDouble / sa.size
        if c >= t
      } yield (ia, ib, BigDecimal(c).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)).toSet
    }
    for (t <- Seq(0.4, 0.7)) {
      val got = FuzzyJoin.containmentSelfJoin(docs, "doc_id", "text",
          n = 4, threshold = t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      assert(got === brute(t), s"threshold=$t")
    }
  }

  test("containmentSelfJoin emits both directions for mutual near-subsets") {
    val df = Seq((1L, "a b c d e"), (2L, "a b c d e")).toDF("id", "text")
    val got = FuzzyJoin.containmentSelfJoin(df, "id", "text", n = 2,
        threshold = 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 2L), (2L, 1L)))
  }

  test("containmentSelfJoin fails loudly on a hot prefix posting") {
    val rows = (1L to 60L).map(i => (i, "same words every time here"))
    val ex = intercept[IllegalArgumentException] {
      FuzzyJoin.containmentSelfJoin(rows.toDF("id", "text"), "id", "text",
        n = 2, threshold = 0.5, maxPostings = 10).collect()
    }
    assert(ex.getMessage.contains("postings"))
  }

  test("JaroWinkler kernel matches the DuckDB-pinned reference values") {
    import graft.functions.JaroWinkler.simStr
    // values read straight off jaro_winkler_similarity on the oracle
    // engine (the 3000-pair fuzz in the expression's scaladoc)
    assert(simStr("MARTHA", "MARHTA") === 0.9611111111111111)
    assert(simStr("DIXON", "DICKSONX") === 0.8133333333333332)
    assert(simStr("DWAYNE", "DUANE") === 0.8400000000000001)
    assert(simStr("CRATE", "TRACE") === 0.7333333333333334)
    assert(simStr("hello world", "hello wrold") === 0.9818181818181818)
    // the pinned edge cases: both-empty is 0 (NOT the classical 1),
    // window 0 makes equal-length transposes score 0
    assert(simStr("", "") === 0.0)
    assert(simStr("a", "") === 0.0)
    assert(simStr("ab", "ba") === 0.0)
    assert(simStr("abc", "bca") === 0.0)
    assert(simStr("a", "a") === 1.0)
  }

  test("jaro_winkler column expression stays in whole-stage codegen") {
    graft.plans.GraftExtensions.ensureRegistered(spark)
    val df = Seq(("MARTHA", "MARHTA")).toDF("a", "b")
      .select(call_function("jaro_winkler", col("a"), col("b")).as("jw"))
    assert(df.head().getDouble(0) === 0.9611111111111111)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), plan)
    // null-intolerant: null in, null out (typed NULL — the expression
    // requires STRING children, implicit-cast traits being private)
    assert(spark.sql("SELECT jaro_winkler(CAST(NULL AS STRING), 'x')")
      .head().isNullAt(0))
  }

  test("jaroWinklerPairs blocks, caps and thresholds on the rounded grid") {
    val df = Seq(
      (1L, "martha stewart"), (2L, "marhta stewart"), (3L, "martin shore"),
      (4L, "zeta jones"), (5L, "zeta jonse")
    ).toDF("id", "name")
    val out = FuzzyJoin.jaroWinklerPairs(df, "id", "name",
        substring_index(col("name"), " ", 1), minSim = 0.9)
      .orderBy("id_a", "id_b").collect()
    // blocks: martha/marhta/martin share no first token — only exact
    // first-token blocks compare; zeta pair scores high
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((4L, 5L)))
    assert(out.head.getDouble(2) >= 0.9)
    // degenerate block capped: 3 same-name rows with maxBlockSize 2
    val hot = Seq((1L, "x a"), (2L, "x b"), (3L, "x c")).toDF("id", "name")
    val capped = FuzzyJoin.jaroWinklerPairs(hot, "id", "name",
      substring_index(col("name"), " ", 1), minSim = 0.1, maxBlockSize = 2)
    assert(capped.count() === 0L)
  }
}
