package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")

  // A corpus with planted duplicates: ids 9000001/9000002 duplicate doc 1's
  // text exactly; 9000003 is a near-dup of doc 2 (one word appended).
  private lazy val planted = {
    val base = docs.select($"doc_id", $"text")
    val d1 = docs.filter($"doc_id" === 1).select($"text").head().getString(0)
    val d2 = docs.filter($"doc_id" === 2).select($"text").head().getString(0)
    base.union(Seq(
      (9000001L, d1), (9000002L, d1), (9000003L, d2 + " zzz")
    ).toDF("doc_id", "text"))
  }

  test("exact dedup groups identical texts under the min id") {
    val groups = Dedup.exact(planted, "doc_id", "text")
    val g1 = groups.filter($"keep_id" === 1).head()
    assert(g1.getAs[Long]("n_dups") === 3) // doc 1 + two planted copies
    // total distinct digests = distinct texts
    val nDistinctTexts = planted.select("text").distinct().count()
    assert(groups.count() === nDistinctTexts)
  }

  test("shingles: n-gram count and contents") {
    val row = spark.range(1).select(
      Dedup.shingleExpr(lit("a b c d"), 2).as("sh")).head()
    val sh = row.getSeq[String](0)
    assert(sh.toSet === Set("a b", "b c", "c d"))
  }

  test("jaccard pairs find the planted near-dup and exact dups") {
    val pairs = Dedup.jaccardPairs(planted, "doc_id", "text", n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // exact copies have jaccard 1.0
    assert(pairs.exists { case (a, b, j) => a == 9000001L && b == 9000002L && j == 1.0 })
    assert(pairs.exists { case (a, b, j) => a == 1L && b == 9000001L && j == 1.0 })
    // near-dup of doc 2 at high but < 1 similarity
    assert(pairs.exists { case (a, b, j) => a == 2L && b == 9000003L && j > 0.8 && j < 1.0 })
  }

  test("minhash LSH surfaces the same planted pairs as candidates") {
    val cand = Dedup.minhashPairs(planted, "doc_id", "text",
        shingleN = 3, numHashes = 64, bands = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cand.contains((9000001L, 9000002L)))
    assert(cand.contains((1L, 9000001L)))
    assert(cand.contains((2L, 9000003L)))
  }

  test("minhash signature of identical docs is identical") {
    val sig = Dedup.minhashSignatures(planted, "doc_id", "text")
    val s1 = sig.filter($"id" === 9000001L).drop("id").head().toSeq
    val s2 = sig.filter($"id" === 9000002L).drop("id").head().toSeq
    assert(s1 === s2)
  }

  test("simhash pairs: identical docs at hamming 0, near-dup close") {
    val pairs = Dedup.simhashPairs(planted, "doc_id", "text", maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.exists { case (a, b, h) => a == 9000001L && b == 9000002L && h == 0 })
    assert(pairs.exists { case (a, b, _) => a == 2L && b == 9000003L })
  }

  test("connected components merge transitively linked pairs") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val labels = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels(1L) === 1L && labels(2L) === 1L && labels(3L) === 1L)
    assert(labels(10L) === 10L && labels(11L) === 10L)
  }

  test("removeNearDuplicates keeps one representative per duplicate cluster") {
    val deduped = Dedup.removeNearDuplicates(planted, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // the exact-copy cluster {1, 9000001, 9000002} survives as doc 1 only
    assert(deduped.contains(1L))
    assert(!deduped.contains(9000001L) && !deduped.contains(9000002L))
    // near-dup of doc 2 collapses into doc 2
    assert(deduped.contains(2L) && !deduped.contains(9000003L))
    // exactly one survivor per component (the corpus has genuine near-dup
    // clusters of its own, so derive the expectation from the components)
    val labels = Dedup.connectedComponents(
      Dedup.minhashPairs(planted, "doc_id", "text").select("id_a", "id_b"))
    val nodes = labels.count()
    val components = labels.select("label").distinct().count()
    assert(deduped.size === planted.count() - (nodes - components))
  }

  test("connected components with a reliable checkpoint dir match localCheckpoint") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-ckpt").toString
    try {
      val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L))
        .toDF("id_a", "id_b")
      val local = Dedup.connectedComponents(pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val reliable = Dedup.connectedComponents(pairs, checkpointDir = Some(dir))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(reliable === local)
      // reliable checkpoints actually landed on shared storage
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(wrote > 0)
      // superseded generations and the pinned edges were deleted: only the
      // final labels generation's rdd-* dir remains (no O(iterations) leak)
      import scala.jdk.CollectionConverters._
      val rddDirs = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .iterator().asScala
        .filter(p => java.nio.file.Files.isDirectory(p) &&
          p.getFileName.toString.startsWith("rdd-")).toList
      assert(rddDirs.size === 1, s"leaked checkpoint generations: $rddDirs")
      // the session checkpoint dir was restored (it was unset before)
      assert(spark.sparkContext.getCheckpointDir.isEmpty)
    } finally {
      spark.sparkContext.setCheckpointDir(null)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("removeNearDuplicates with deepComponents keeps the same representatives") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val prop = Dedup.removeNearDuplicates(docs, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val lss = Dedup.removeNearDuplicates(docs, "doc_id", "text", deepComponents = true)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(lss === prop)
  }

  test("large-star/small-star CC matches min-label propagation on real pair relations") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text").select("id_a", "id_b")
    val prop = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lss = Dedup.connectedComponentsLSS(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lss === prop)
  }

  test("LSS labels a 200-node chain correctly where bounded propagation cannot") {
    // the min label travels ONE hop per propagation round, so a deep chain
    // needs ~n rounds; LSS converges in O(log n) regardless of diameter
    val chain = (1L until 200L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val lss = Dedup.connectedComponentsLSS(chain)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(lss.length === 200)
    assert(lss.forall(_._2 === 1L))
    // same graph, propagation capped at 5 rounds: provably unfinished —
    // this is the failure mode connectedComponentsLSS exists to remove
    val prop = Dedup.connectedComponents(chain, maxIter = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(prop.exists(_._2 !== 1L))
  }

  test("a pre-existing session checkpoint dir is restored after a CC run") {
    val prev = java.nio.file.Files.createTempDirectory("graft-prev-ckpt").toString
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-ckpt2").toString
    try {
      spark.sparkContext.setCheckpointDir(prev)
      val before = spark.sparkContext.getCheckpointDir.get
      val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
      Dedup.connectedComponents(pairs, checkpointDir = Some(dir)).collect()
      // setCheckpointDir re-resolves to a fresh UUID child, so "restored"
      // means: back under the previous root, not under `dir`
      val after = spark.sparkContext.getCheckpointDir.get
      assert(after.startsWith(before), s"$after not under $before")
      assert(!after.contains(new java.io.File(dir).getName))
    } finally {
      spark.sparkContext.setCheckpointDir(null)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(prev))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("bucket-size capping drops universal shingles from candidate generation") {
    // every doc shares the shingle "x y"; with the bucket cap at 2 that hot
    // bucket is dropped, so the universal shingle cannot create O(n^2) pairs
    val univ = (1 to 10).map(i => (i.toLong, s"x y unique$i only$i here$i")).toDF("doc_id", "text")
    val pairs = Dedup.jaccardPairs(univ, "doc_id", "text", n = 2, threshold = 0.01, maxBucketSize = 2)
    assert(pairs.count() === 0)
  }

  test("containment: exact copy = 1, partial overlap exact, disjoint and short docs = 0") {
    val bench = "the quick brown fox jumps over the lazy dog tonight"
    val probe = Seq((100L, bench)).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, bench),                                        // exact copy
      (2L, "the quick brown fox jumps somewhere else entirely new today"), // shares 2-gram prefix
      (3L, "completely different words with no shared phrases at all here"),
      (4L, "too short")                                   // < n tokens
    ).toDF("doc_id", "text")
    val got = Dedup.containment(corpus, probe, "doc_id", "text", n = 5)
      .orderBy("doc_id").collect()
    assert(got.length === 4)
    // doc 1: all 6 distinct 5-grams of a 10-token doc hit
    assert(got(0).getInt(1) === 6 && got(0).getLong(2) === 6L)
    assert(got(0).getDouble(3) === 1.0)
    // doc 2: 10 tokens → 6 grams; only "the quick brown fox jumps" shared
    assert(got(1).getInt(1) === 6 && got(1).getLong(2) === 1L)
    assert(math.abs(got(1).getDouble(3) - 1.0 / 6.0) < 1e-12)
    // doc 3: zero hits; doc 4: no grams at all
    assert(got(2).getLong(2) === 0L && got(2).getDouble(3) === 0.0)
    assert(got(3).getInt(1) === 0 && got(3).getLong(2) === 0L && got(3).getDouble(3) === 0.0)
  }

  test("jaccardJoinPairs finds exactly the cross pairs above threshold") {
    val a = Seq(
      (1L, "w1 w2 w3 w4 w5 w6"),
      (2L, "z1 z2 z3 z4 z5 z6")
    ).toDF("id", "text")
    val b = Seq(
      (10L, "w1 w2 w3 w4 w5 w6"),        // identical to a1 -> J = 1
      (11L, "w1 w2 w3 w4 w5 x9"),        // shares 2 of 4+4-2... partial
      (12L, "q1 q2 q3 q4 q5 q6")         // disjoint
    ).toDF("id", "text")
    // 3-gram shingles of 6 tokens -> 4 shingles/doc
    val got = Dedup.jaccardJoinPairs(a, "id", "text", b, "id", "text",
        n = 3, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(got.keySet === Set((1L, 10L), (1L, 11L)))
    assert(got((1L, 10L)) === 1.0)
    // doc 11 shares shingles w1w2w3, w2w3w4, w3w4w5 -> 3 of (4+4-3)=5
    assert(math.abs(got((1L, 11L)) - 3.0 / 5) < 1e-12)
  }

  test("jaccardJoinPairs equals a brute-force cross check on a corpus slice") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(60)
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 === 1)
    val fast = Dedup.jaccardJoinPairs(a, "doc_id", "text", b, "doc_id",
        "text", n = 5, threshold = 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // brute force: all cross pairs via the self-pair relation on the union
    val all = Dedup.jaccardPairs(docs, "doc_id", "text", n = 5,
        threshold = 0.2, maxBucketSize = 100000)
      .collect().flatMap { r =>
        val (x, y, j) = (r.getLong(0), r.getLong(1), r.getDouble(2))
        if (x % 2 == 0 && y % 2 == 1) Some((x, y) -> j)
        else if (x % 2 == 1 && y % 2 == 0) Some((y, x) -> j)
        else None
      }.toMap
    assert(fast.keySet === all.keySet)
    fast.foreach { case (k, j) => assert(math.abs(j - all(k)) < 1e-9, k) }
  }

  test("jaccardJoinPairs: hot-bucket product cap drops pathological shingles") {
    val a = (1L to 30L).map(i => (i, "h1 h2 h3 common tail" + i))
      .toDF("id", "text")
    val b = (100L to 130L).map(i => (i, "h1 h2 h3 common tail" + i))
      .toDF("id", "text")
    val capped = Dedup.jaccardJoinPairs(a, "id", "text", b, "id", "text",
      n = 3, threshold = 0.3, maxBucketPairs = 10)
    // every prefix shingle is shared by all rows -> all buckets overflow
    assert(capped.count() === 0L)
  }

  test("oncePerWindow keeps the (ts, id)-minimal row per key per window") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val hourUs = 3600L * 1000000
    val df = Seq(
      // key k1: two rows in the 10:00 window (id 2 earlier), one at 12:05
      ("k1", ts("2024-01-01 10:20:00"), 1L),
      ("k1", ts("2024-01-01 10:05:00"), 2L),
      ("k1", ts("2024-01-01 12:05:00"), 3L),
      // key k2: same-timestamp duplicates resolve on the id
      ("k2", ts("2024-01-01 10:20:00"), 5L),
      ("k2", ts("2024-01-01 10:20:00"), 4L)
    ).toDF("key", "ts", "id")
    val out = Dedup.oncePerWindow(df, "key", "ts", hourUs, "id")
      .orderBy("key", "id").collect()
    assert(out.map(_.getLong(2)).toSeq === Seq(2L, 3L, 4L))
    // window_start is the epoch-aligned bucket floor
    assert(out(0).getTimestamp(3) === ts("2024-01-01 10:00:00"))
    assert(out(1).getTimestamp(3) === ts("2024-01-01 12:00:00"))
  }

  test("oncePerWindow: windows are absolute, not anchored per key") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val hourUs = 3600L * 1000000
    // 10:50 and 11:10 are 20 minutes apart but in DIFFERENT hours: both kept
    val df = Seq(("k", ts("2024-01-01 10:50:00"), 1L),
      ("k", ts("2024-01-01 11:10:00"), 2L)).toDF("key", "ts", "id")
    assert(Dedup.oncePerWindow(df, "key", "ts", hourUs, "id").count() === 2L)
  }

  test("oncePerWindow is invariant to input partitioning") {
    def ts(i: Int) = new java.sql.Timestamp(1700000000000L + i * 617000L)
    val df = (1 to 200).map(i => (s"k${i % 7}", ts(i), i.toLong))
      .toDF("key", "ts", "id")
    val a = Dedup.oncePerWindow(df, "key", "ts", 3600L * 1000000, "id")
      .orderBy("id").collect().toSeq
    val b = Dedup.oncePerWindow(df.repartition(9), "key", "ts",
        3600L * 1000000, "id")
      .orderBy("id").collect().toSeq
    assert(a === b)
  }

  test("duplicateSpans: shared trigram positions flagged, short docs null") {
    // docs 1 and 2 share the span "a b c" (1 position each);
    // doc 3 is all-unique; doc 4 too short for n = 3
    val df = Seq(
      (1L, "a b c x y"), (2L, "p q a b c"), (3L, "u v w z k"),
      (4L, "s t")).toDF("id", "text")
    val got = Dedup.duplicateSpans(df, "id", "text", n = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(got(1L) === ((3L, 1L, Some(BigDecimal(1.0 / 3).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble))))
    assert(got(2L) === ((3L, 1L, got(1L)._3)))
    assert(got(3L) === ((3L, 0L, Some(0.0))))
    assert(got(4L) === ((0L, 0L, None)))
  }

  test("duplicateSpans counts REPEATED in-doc positions, docs once") {
    // "a b a b a b": 3-gram positions [aba, bab, aba, bab] — the gram
    // "a b a" occurs twice in doc 1; doc 2 shares it once. Both
    // positions in doc 1 are duplicated spans.
    val df = Seq((1L, "a b a b a"), (2L, "a b a")).toDF("id", "text")
    val got = Dedup.duplicateSpans(df, "id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1L) === ((3L, 2L))) // positions: aba, bab, aba; aba dup'd
    assert(got(2L) === ((1L, 1L)))
  }

  test("removeDuplicateSpans drops covered tokens, keeps the rest") {
    // docs 1 and 2 share the trigram "a b c": doc 1 loses tokens 0-2,
    // doc 2 loses tokens 2-4; doc 3 untouched; doc 4 shorter than n
    val df = Seq(
      (1L, "a b c x y"), (2L, "p q a b c"), (3L, "u v w z k"),
      (4L, "s t")).toDF("id", "text")
    val got = Dedup.removeDuplicateSpans(df, "id", "text", n = 3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(got(1L) === (("x y", 5L, 2L)))
    assert(got(2L) === (("p q", 5L, 2L)))
    assert(got(3L) === (("u v w z k", 5L, 5L)))
    assert(got(4L) === (("s t", 2L, 2L)))
  }

  test("removeDuplicateSpans: overlapping spans union; full wipe -> empty") {
    // docs share both trigrams of "a b c d" -> all 4 tokens covered in
    // doc 1; doc 2's copy is also fully covered mid-string
    val df = Seq((1L, "a b c d"), (2L, "x a b c d y"))
      .toDF("id", "text")
    val got = Dedup.removeDuplicateSpans(df, "id", "text", n = 3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(got(1L) === (("", 4L, 0L)))
    assert(got(2L) === (("x y", 6L, 2L)))
  }

  test("removeDuplicateSpans is partition-invariant") {
    val df = (1 to 40).map(i =>
      (i.toLong, if (i % 4 == 0) s"common span here t$i u$i"
        else s"w$i common span here z$i")).toDF("id", "text")
    val a = Dedup.removeDuplicateSpans(df, "id", "text", n = 3)
      .orderBy("id").collect().toSeq
    val b = Dedup.removeDuplicateSpans(df.repartition(7), "id", "text",
      n = 3).orderBy("id").collect().toSeq
    assert(a === b)
  }

  test("portable minhash: identical docs share every signature component") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "one two three four five six")).toDF("id", "text")
    val sig = Dedup.minhashSignaturesPortable(df, "id", "text",
        shingleN = 3, numHashes = 16)
      .collect().map(r => r.getLong(0) ->
        (1 to 16).map(r.getLong).toSeq).toMap
    assert(sig(1L) === sig(2L))
    assert(sig(1L) !== sig(3L))
    assert(sig.values.forall(_.forall(v => v >= 0 && v < 2147483647L)))
  }

  test("portable minhash signatures are deterministic and partition-invariant") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def run(df: org.apache.spark.sql.DataFrame) =
      Dedup.minhashSignaturesPortable(df, "doc_id", "text", 3, 8)
        .collect().map(r => r.getLong(0) -> (1 to 8).map(r.getLong)).toMap
    assert(run(docs) === run(docs.repartition(13)))
  }

  test("portable pairs: exact duplicates pair with all bands shared") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "one two three four five six")).toDF("id", "text")
    val pairs = Dedup.minhashPairsPortable(df, "id", "text", 3, 16, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.get((1L, 2L)).contains(4L),
      s"duplicates must share all 4 bands: $pairs")
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }

  test("portable simhash: identical docs get identical fingerprints; near docs are close in hamming") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "alpha beta gamma delta epsilon zeta eta iota"), // 1 token off
      (4L, "one two three four five six seven eight")).toDF("id", "text")
    val fp = Dedup.simhashPortable(df, "id", "text", 3, bits = 24)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(fp(1L) === fp(2L))
    assert(ham(fp(1L), fp(3L)) < ham(fp(1L), fp(4L)),
      s"near dup must be closer: $fp")
    assert(fp.values.forall(v => v >= 0 && v < (1L << 24)))
    // partition invariance
    val fp2 = Dedup.simhashPortable(df.repartition(7), "id", "text", 3, 24)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp === fp2)
  }
}
