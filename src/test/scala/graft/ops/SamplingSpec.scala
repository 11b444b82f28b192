package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("every row gets exactly one split label; proportions track the weights") {
    val sp = Sampling.withSplit(docs, "text", "split")
    assert(sp.count() === docs.count())
    val byLabel = sp.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLabel.keySet === Set("train", "val", "test"))
    val n = docs.count().toDouble
    // 12/2/2 sixteenths with a generous tolerance at test scale
    assert(byLabel("train") / n > 0.55 && byLabel("train") / n < 0.95)
  }

  test("split assignment is deterministic and partitioning-invariant") {
    def labels(df: org.apache.spark.sql.DataFrame) =
      Sampling.withSplit(df, "text", "split")
        .select("doc_id", "split").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(labels(docs) === labels(docs.repartition(13)))
  }

  test("duplicate content lands in the same split") {
    val dup = Seq((1L, "the same doc"), (2L, "the same doc"), (3L, "another doc"))
      .toDF("doc_id", "text")
    val sp = Sampling.withSplit(dup, "text", "split")
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(sp(1L) === sp(2L))
  }

  test("deterministicSample is monotone in the fraction and content-keyed") {
    val s4 = Sampling.deterministicSample(docs, "text", 4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s8 = Sampling.deterministicSample(docs, "text", 8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s4.subsetOf(s8))
    assert(s4.nonEmpty && s8.size < docs.count())
    assert(Sampling.deterministicSample(docs, "text", 16).count() === docs.count())
  }

  test("null content routes to the first split and is kept by the sample (consistent)") {
    val mixed = Seq((1L, "a real doc"), (2L, null), (3L, "another doc"))
      .toDF("doc_id", "text")
    val sp = Sampling.withSplit(mixed, "text", "split")
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(sp(2L) === "train") // first split, never the test split
    // every sample fraction keeps the null row — same lowest-bucket rule
    val kept = Sampling.deterministicSample(mixed, "text", 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.contains(2L))
  }

  test("stratifiedSample applies per-stratum fractions; default drops unlisted strata") {
    val langs = docs.select("lang").distinct().collect().map(_.getString(0))
    assert(langs.length >= 2)
    val keep = langs.head
    val out = Sampling.stratifiedSample(docs, "lang", "text", Map(keep -> 16))
    // unlisted strata are dropped entirely; the listed one is kept whole
    assert(out.select("lang").distinct().collect().map(_.getString(0)).toSeq === Seq(keep))
    assert(out.count() === docs.filter(col("lang") === keep).count())
    // a 4/16 stratum is a subset of its own rows and roughly a quarter
    val quarter = Sampling.stratifiedSample(docs, "lang", "text", Map(keep -> 4))
    val frac = quarter.count().toDouble / docs.filter(col("lang") === keep).count()
    assert(frac > 0.1 && frac < 0.45, s"fraction $frac")
    // per-stratum sampling agrees with the global deterministicSample filter
    val viaGlobal = Sampling.deterministicSample(
      docs.filter(col("lang") === keep), "text", 4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(quarter.select("doc_id").collect().map(_.getLong(0)).toSet === viaGlobal)
  }

  test("invalid weights are rejected") {
    intercept[IllegalArgumentException] {
      Sampling.splitColumn(col("text"), Seq("a" -> 10, "b" -> 5))
    }
    intercept[IllegalArgumentException] {
      Sampling.splitColumn(col("text"), Seq("a" -> 16))
    }
  }

  test("mixtureWeights: alpha=1 is natural sampling; alpha<1 flattens; weights sum to 1") {
    val df = Seq.fill(90)(("big", 100L)) ++ Seq.fill(10)(("small", 10L))
    val docs = df.toDF("source", "n")
    val nat = Sampling.mixtureWeights(docs, "source", "n", alpha = 1.0, budget = 1000.0)
      .collect().map(r => r.getString(0) -> (r.getDouble(3), r.getDouble(4))).toMap
    // alpha=1: weight == natural_frac
    nat.values.foreach { case (f, w) => assert(math.abs(f - w) < 1e-12) }
    val flat = Sampling.mixtureWeights(docs, "source", "n", alpha = 0.5, budget = 1000.0)
      .collect().map(r => r.getString(0) -> (r.getDouble(3), r.getDouble(4))).toMap
    // flattening: the small domain's weight rises above its natural share
    assert(flat("small")._2 > flat("small")._1)
    assert(flat("big")._2 < flat("big")._1)
    assert(math.abs(flat.values.map(_._2).sum - 1.0) < 1e-12)
    // epochs: budget * weight / mass; small domain gets upsampled harder
    val ep = Sampling.mixtureWeights(docs, "source", "n", alpha = 0.5, budget = 1000.0)
      .collect().map(r => r.getString(0) -> r.getDouble(5)).toMap
    assert(ep("small") > ep("big"))
  }

  test("capPerKey: hard per-key quota, deterministic selection, small keys whole") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val capped = Sampling.capPerKey(docs, "source", "doc_id", 20)
    val byKey = capped.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val orig = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    orig.foreach { case (k, n) => assert(byKey(k) === math.min(n, 20L), k) }
    // deterministic: same ids selected on a re-run over a repartitioned input
    val again = Sampling.capPerKey(docs.repartition(7), "source", "doc_id", 20)
    assert(again.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ===
      capped.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
    // schema passes through (no helper columns leak)
    assert(capped.columns.toSeq === docs.columns.toSeq)
  }

  test("mixtureWeights rejects alpha outside (0, 1]") {
    val docs = Seq(("a", 1L)).toDF("source", "n")
    intercept[IllegalArgumentException] {
      Sampling.mixtureWeights(docs, "source", "n", alpha = 0.0, budget = 1.0)
    }
    intercept[IllegalArgumentException] {
      Sampling.mixtureWeights(docs, "source", "n", alpha = 1.5, budget = 1.0)
    }
  }

  test("weightedSample reproduces the literal ES-key selection, any partitioning") {
    import java.security.MessageDigest
    val rows = (1 to 200).map(i => (i.toLong, (i % 17 + 1).toDouble))
    val df = rows.toDF("id", "w")
    def key(id: Long, w: Double): Double = {
      val hex = MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      val u = (java.lang.Long.parseLong(hex, 16).toDouble + 0.5) / math.pow(16, 15)
      -math.log(u) / w
    }
    val expect = rows.sortBy { case (id, w) => (key(id, w), id) }
      .take(25).map(_._1).toSet
    val got = Sampling.weightedSample(df, "id", "w", 25)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got === expect)
    val got2 = Sampling.weightedSample(df.repartition(9), "id", "w", 25)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got2 === expect)
  }

  test("weightedSample drops non-positive weights and favors heavy rows") {
    val df = Seq((1L, Some(1000.0)), (2L, Some(1000.0)), (3L, Some(0.001)),
      (4L, Some(0.0)), (5L, Some(-3.0)), (6L, None))
      .toDF("id", "w")
    val got = Sampling.weightedSample(df, "id", "w", 2)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got === Set(1L, 2L)) // the two heavy rows dominate w=0.001
    intercept[IllegalArgumentException] {
      Sampling.weightedSample(df, "id", "w", 0)
    }
  }

  test("topPMass keeps the minimal heavy prefix per key, ≥ 1 row each") {
    import spark.implicits._
    val df = Seq(
      ("s1", 1L, 50.0), ("s1", 2L, 30.0), ("s1", 3L, 15.0), ("s1", 4L, 5.0),
      ("s2", 5L, 99.0), ("s2", 6L, 1.0)
    ).toDF("src", "id", "w")
    // p=0.8 on s1 (total 100): keep 50, 30 (before=80 NOT < 80 stops 15)
    val kept = Sampling.topPMass(df, "src", "w", "id", p = 0.8)
      .select("src", "id").collect().map(r => (r.getString(0), r.getLong(1)))
      .toSet
    assert(kept === Set(("s1", 1L), ("s1", 2L), ("s2", 5L)))
    // p tiny: the single heaviest row per key survives
    val one = Sampling.topPMass(df, "src", "w", "id", p = 0.01)
      .select("src", "id").collect().map(r => (r.getString(0), r.getLong(1)))
      .toSet
    assert(one === Set(("s1", 1L), ("s2", 5L)))
    // p=1 keeps everything
    assert(Sampling.topPMass(df, "src", "w", "id", p = 1.0).count() === 6L)
    intercept[IllegalArgumentException] {
      Sampling.topPMass(df, "src", "w", "id", p = 0.0)
    }
  }

  test("topPMass ties break deterministically on the id column") {
    import spark.implicits._
    val df = Seq(("k", 1L, 10.0), ("k", 2L, 10.0), ("k", 3L, 10.0))
      .toDF("src", "id", "w")
    // p=0.5: before-sums are 0, 10, 20 vs threshold 15 → ids 1 and 2 stay
    val kept = Sampling.topPMass(df, "src", "w", "id", p = 0.5)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 2L))
  }

  test("tokenBudget: crossing row included, unbudgeted keys dropped") {
    val df = (1L to 4L).map(i => ("a", i, 5L)) ++ Seq(("z", 9L, 5L))
    val out = Sampling.tokenBudget(df.toDF("src", "id", "toks"),
      "src", "id", "toks", Map("a" -> 12L))
    val kept = out.select("id").collect().map(_.getLong(0)).toSet
    assert(!kept.contains(9L), "key without a budget must be dropped")
    // before-sums in md5 order are 0, 5, 10, 15 vs budget 12 → 3 rows
    assert(kept.size === 3)
    // determinism under any partitioning
    val again = Sampling.tokenBudget(df.toDF("src", "id", "toks")
        .repartition(7), "src", "id", "toks", Map("a" -> 12L))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(again === kept)
  }

  test("tokenBudget: every budgeted key keeps at least one row") {
    val df = Seq(("a", 1L, 1000L), ("b", 2L, 1000L)).toDF("src", "id", "toks")
    val out = Sampling.tokenBudget(df, "src", "id", "toks",
      Map("a" -> 1L, "b" -> 1L))
    assert(out.count() === 2, "the budget-crossing first row stays")
  }

  test("blockMeansCI: constant column collapses the interval on the mean") {
    val df = (1L to 200L).map(i => (i, 7.5)).toDF("id", "x")
    val r = Sampling.blockMeansCI(df, "id", "x", blocks = 8).head()
    assert(r.getDouble(0) === 7.5)
    assert(r.getDouble(1) === 0.0)
    assert(r.getDouble(2) === 7.5 && r.getDouble(3) === 7.5)
    assert(r.getLong(4) === 200L && r.getLong(5) === 8L)
  }

  test("blockMeansCI: overall mean is the exact weighted block combine") {
    val df = (1L to 500L).map(i => (i, i.toDouble)).toDF("id", "x")
    val r = Sampling.blockMeansCI(df, "id", "x", blocks = 16).head()
    assert(math.abs(r.getDouble(0) - 250.5) < 1e-9)
    assert(r.getDouble(1) > 0.0, "block means differ, se > 0")
    assert(r.getDouble(2) < 250.5 && r.getDouble(3) > 250.5)
  }

  test("kCenter: one pick per well-separated cluster, deterministic") {
    val pts = Seq(
      (1L, Array(0.0, 0.0)), (2L, Array(0.1, 0.0)), (3L, Array(0.0, 0.1)),
      (4L, Array(50.0, 0.0)), (5L, Array(50.1, 0.0)),
      (6L, Array(0.0, 80.0)), (7L, Array(0.1, 80.0))
    ).toDF("vec_id", "embedding")
    val got = Sampling.kCenter(pts, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(got.length === 3)
    val clusters = got.map { case (id, _, _) =>
      if (id <= 3) "a" else if (id <= 5) "b" else "c" }.toSet
    assert(clusters.size === 3, s"picks ${got.toSeq} must cover all clusters")
    // farthest-point min-dists are non-increasing after the seed
    val dists = got.sortBy(_._2).map(_._3)
    assert(dists(0) === 0.0)
    assert(dists(1) >= dists(2))
    // determinism under repartition
    val again = Sampling.kCenter(pts.repartition(5), "vec_id", "embedding", 3)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(again === got.map(t => (t._1, t._2)).toSet)
  }

  test("kCenter: k = 1 returns only the deterministic seed") {
    val pts = Seq((1L, Array(1.0)), (2L, Array(2.0))).toDF("vec_id", "embedding")
    val got = Sampling.kCenter(pts, "vec_id", "embedding", 1).collect()
    assert(got.length === 1)
    assert(got.head.getDouble(2) === 0.0)
  }

  test("oversample: exact replication when the remainder is zero") {
    // A: 4 rows, B: 2 rows → target 4; every B row gets exactly 2 copies
    val df = ((1 to 4).map(i => ("A", i.toLong)) ++
      (5 to 6).map(i => ("B", i.toLong))).toDF("cls", "id")
    val out = Sampling.oversample(df, "cls", "id")
    val byClass = out.groupBy("cls").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byClass === Map("A" -> 4L, "B" -> 4L))
    // copy indices are 1-based and dense
    val copies = out.filter($"cls" === "B" && $"id" === 5L)
      .select("copy").collect().map(_.getLong(0)).sorted
    assert(copies.toSeq === Seq(1L, 2L))
  }

  test("oversample: fractional remainder adds at most one extra copy") {
    // A: 3, B: 2 → target 3; B base = 1, remainder frac = 1/2 per row
    val df = ((1 to 3).map(i => ("A", i.toLong)) ++
      (4 to 5).map(i => ("B", i.toLong))).toDF("cls", "id")
    val perRow = Sampling.oversample(df, "cls", "id")
      .filter($"cls" === "B").groupBy("id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perRow.values.forall(c => c == 1L || c == 2L))
  }

  test("oversample is deterministic and partition-invariant") {
    val df = ((1 to 9).map(i => ("A", i.toLong)) ++
      (10 to 13).map(i => ("B", i.toLong)) ++
      (14 to 15).map(i => ("C", i.toLong))).toDF("cls", "id")
    val a = Sampling.oversample(df, "cls", "id")
      .orderBy("cls", "id", "copy").collect().toSeq
    val b = Sampling.oversample(df.repartition(7), "cls", "id")
      .orderBy("cls", "id", "copy").collect().toSeq
    assert(a === b)
    // majority class is never replicated
    assert(a.filter(_.getString(0) == "A").forall(_.getLong(2) === 1L))
  }

  test("negativeSample: catalog membership and positive exclusion hold") {
    val pos = Seq((1L, 3L), (1L, 7L), (2L, 5L)).toDF("user", "item")
    val items = (1L to 10L).map(Tuple1(_)).toDF("item")
    val out = Sampling.negativeSample(pos, items, "user", "item",
        k = 20, maxItemId = 10L).collect()
    assert(out.nonEmpty)
    val posSet = Set((1L, 3L), (1L, 7L), (2L, 5L))
    out.foreach { r =>
      val (u, i) = (r.getLong(0), r.getLong(2))
      assert(i >= 1L && i <= 10L)
      assert(!posSet((u, i)), s"positive ($u, $i) leaked into negatives")
    }
  }

  test("negativeSample: nonexistent catalog ids are dropped, not redrawn") {
    val pos = Seq((1L, 2L)).toDF("user", "item")
    // catalog holds only even ids in [1, 100]: roughly half the slots drop
    val items = (1L to 100L).filter(_ % 2 == 0).map(Tuple1(_)).toDF("item")
    val out = Sampling.negativeSample(pos, items, "user", "item",
        k = 40, maxItemId = 100L).collect()
    assert(out.length < 40)
    assert(out.forall(_.getLong(2) % 2 == 0))
  }

  test("negativeSample is deterministic and partition-invariant") {
    val pos = (1L to 30L).map(u => (u, u % 7 + 1)).toDF("user", "item")
    val items = (1L to 50L).map(Tuple1(_)).toDF("item")
    val a = Sampling.negativeSample(pos, items, "user", "item", 5, 50L)
      .orderBy("user", "slot").collect().toSeq
    val b = Sampling.negativeSample(pos.repartition(8), items.repartition(3),
        "user", "item", 5, 50L)
      .orderBy("user", "slot").collect().toSeq
    assert(a === b)
  }

  test("mixtureRates: equal shares, small source caps at rate 1") {
    // big: 100 tokens, small: 10 tokens; budget = 0.5 * 110 = 55,
    // share each = 27.5 -> big rate 0.275, small rate capped at 1
    val docs = Seq(
      ("big", ("tok " * 100).trim),
      ("small", ("tok " * 10).trim)).toDF("src", "text")
    val got = Sampling.mixtureRates(docs, "src", "text", 0.5)
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getDouble(4), r.getLong(5))).toMap
    assert(got("big") === ((100L, 0.275, 28L)))
    assert(got("small") === ((10L, 1.0, 10L)))
  }

  test("mixtureRates: explicit target shares steer the rates") {
    val docs = Seq(
      ("a", ("x " * 50).trim), ("b", ("x " * 50).trim)).toDF("src", "text")
    // all budget to a: budget = 50; a rate = min(1, 50/50) = 1, b = 0
    val got = Sampling.mixtureRates(docs, "src", "text", 0.5,
        Some(Map("a" -> 1.0, "b" -> 0.0)))
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(got("a") === 1.0 && got("b") === 0.0)
    intercept[IllegalArgumentException] {
      Sampling.mixtureRates(docs, "src", "text", 0.5,
        Some(Map("a" -> 0.7, "b" -> 0.7)))
    }
  }

  test("importanceWeights: target-like docs outscore off-target docs") {
    val raw = Seq(
      (1L, "alpha beta alpha beta alpha"),  // target vocabulary
      (2L, "zeta eta theta iota kappa"),    // off-target vocabulary
      (3L, "")).toDF("id", "text")          // empty → weight 0
    val target = Seq((10L, "alpha beta alpha alpha beta")).toDF("id", "text")
    val w = Sampling.importanceWeights(raw, target, "id", "text",
        buckets = 64)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(w(1L)._2 > w(2L)._2,
      s"target-vocab doc must outscore off-target: $w")
    assert(w(3L) === ((0L, 0L)), "empty doc keeps zero tokens and weight")
    assert(w(1L)._1 === 5L)
  }

  test("importanceWeights is deterministic and partition-invariant") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val en = docs.filter($"lang" === "en")
    def run(raw: org.apache.spark.sql.DataFrame) =
      Sampling.importanceWeights(raw, en, "doc_id", "text", buckets = 128)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(run(docs) === run(docs.repartition(17)))
  }

  test("rake2d: weighted marginals hit both targets simultaneously") {
    val rows = Seq.fill(30)(("a1", "b1")) ++ Seq.fill(10)(("a1", "b2")) ++
      Seq.fill(10)(("a2", "b1")) ++ Seq.fill(50)(("a2", "b2"))
    val df = rows.toDF("a", "b")
    val raked = Sampling.rake2d(df, "a", "b",
      Map("a1" -> 0.5, "a2" -> 0.5), Map("b1" -> 0.5, "b2" -> 0.5),
      iters = 20)
    val cells = raked.collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    def margin(f: ((String, String)) => String, lvl: String) =
      cells.collect { case (k, (n, w)) if f(k) == lvl => n * w }.sum
    assert(math.abs(margin(_._1, "a1") - 50.0) < 1e-6)
    assert(math.abs(margin(_._2, "b1") - 50.0) < 1e-6)
    assert(math.abs(cells.map { case (_, (n, w)) => n * w }.sum - 100.0) < 1e-6)
  }

  test("rake2d: targets equal to observed marginals of an independent table leave weights at 1") {
    // independent 2x2: n_ab = rowShare*colShare*N
    val rows = Seq.fill(12)(("a1", "b1")) ++ Seq.fill(28)(("a1", "b2")) ++
      Seq.fill(18)(("a2", "b1")) ++ Seq.fill(42)(("a2", "b2"))
    val raked = Sampling.rake2d(rows.toDF("a", "b"), "a", "b",
      Map("a1" -> 0.4, "a2" -> 0.6), Map("b1" -> 0.3, "b2" -> 0.7))
    raked.collect().foreach(r =>
      assert(math.abs(r.getDouble(3) - 1.0) < 1e-9, r.toString))
  }

  test("rake2d: zero-share levels rake to weight 0; missing positive levels reject") {
    val df = (Seq.fill(5)(("a1", "b1")) ++ Seq.fill(5)(("a2", "b1")))
      .toDF("a", "b")
    val raked = Sampling.rake2d(df, "a", "b",
      Map("a1" -> 1.0, "a2" -> 0.0), Map("b1" -> 1.0))
    val w = raked.collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(w("a2") === 0.0 && math.abs(w("a1") - 2.0) < 1e-9)
    intercept[IllegalArgumentException] {
      Sampling.rake2d(df, "a", "b",
        Map("a1" -> 0.5, "a9" -> 0.5), Map("b1" -> 1.0))
    }
  }

  test("importanceSelect: returns exactly k, ordered by weight then id") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val en = docs.filter($"lang" === "en")
    val top = Sampling.importanceSelect(docs, en, "doc_id", "text",
      k = 10, buckets = 128).collect()
    assert(top.length === 10)
    val ws = top.map(r => (r.getLong(2), r.getLong(0)))
    assert(ws.sortBy { case (w, id) => (-w, id) }.toSeq === ws.toSeq)
    // English docs should dominate the selection: every selected weight
    // must be at least the corpus median (weights discriminate)
    val all = Sampling.importanceWeights(docs, en, "doc_id", "text",
      buckets = 128).select("logw_micro")
      .collect().map(_.getLong(0)).sorted
    assert(ws.map(_._1).min >= all(all.length / 2))
  }

  test("stratifiedExactSplit: per-stratum counts are exactly round(n*f)") {
    val df = ((1L to 30L).map(i => (i, "big")) ++
      (31L to 37L).map(i => (i, "small"))).toDF("id", "s")
    val out = Sampling.stratifiedExactSplit(df, Seq("s"), "id", 0.2)
    val counts = out.filter(col("split") === "test")
      .groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts === Map("big" -> 6L, "small" -> 1L))
    assert(out.count() === 37L, "no rows lost")
  }

  test("stratifiedExactSplit is content-keyed and partition-invariant") {
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
    val run = (p: Int) => Sampling.stratifiedExactSplit(
        cust.repartition(p), Seq("c_mktsegment"), "c_custkey", 0.2)
      .select("c_custkey", "split").orderBy("c_custkey").collect().toSeq
    assert(run(1) === run(7))
    intercept[IllegalArgumentException] {
      Sampling.stratifiedExactSplit(cust, Seq("c_mktsegment"),
        "c_custkey", 1.5)
    }
  }
}
