package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths, both pure Spark SQL expressions (no UDFs, codegen-friendly):
  *
  *  - [[bruteTopK]] — exact cosine top-k: broadcast the (small) query set,
  *    one scan over the corpus, per-query top-k. The scored relation is
  *    |queries| × |corpus| rows but only k per query survive the window;
  *    at 100 TB this is the baseline you run on a filtered candidate pool.
  *  - [[lshTopK]] — random-hyperplane LSH: b signature bits per vector from
  *    deterministic hash-derived hyperplanes, banded into equi-join keys;
  *    only bucket-colliding pairs get exact cosine scoring. This is the
  *    scale path: the join is an equi-join on (band, key), so Spark
  *    shuffles candidates, never the full cross product.
  *
  * All arithmetic is done after casting to double (float→double once per
  * element) so scores are reproducible across engines.
  */
object Similarity {

  /** Σ aᵢbᵢ via zip_with + aggregate — sequential fold, deterministic FP.
    * Session-independent but interpreted; hot paths use the native
    * [[graft.functions.ArrayDot]] expression instead (identical results —
    * same left-to-right summation).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Codegen'd dot via the injected `array_dot` expression
    * ([[graft.plans.GraftExtensions]] must be registered on the session).
    */
  private def nativeDot(a: Column, b: Column): Column =
    call_function("array_dot", a.cast("array<double>"), b.cast("array<double>"))

  private def nativeCosine(a: Column, b: Column): Column =
    nativeDot(a, b) / (sqrt(nativeDot(a, a)) * sqrt(nativeDot(b, b)))

  /** Exact cosine top-k neighbors for each query vector.
    *
    * @param corpus  DataFrame with (idCol, vecCol)
    * @param queries DataFrame with (idCol, vecCol) — small; broadcast
    * @param k       neighbors per query (self-matches excluded)
    * @return (query_id, vec_id, cos, rn) — cos rounded to 6 digits BEFORE
    *         ranking so the selected row set is engine-reproducible;
    *         ties broken by corpus id
    */
  /** Hard-negative mining for contrastive training: for each query
    * vector, the k most-similar corpus vectors carrying a DIFFERENT
    * label — the "close but wrong" examples a retrieval/embedding model
    * trains against. Same execution shape as [[bruteTopK]] (broadcast
    * queries, native codegen'd cosine, per-query rank window); swap in
    * the LSH candidate path upstream for corpus-scale query sets, the
    * q38/q39 exact-vs-bucketed twin discipline.
    *
    * @return (query_id, q_label, vec_id, neg_label, cos, rn) — rn ≤ k,
    *         (cos desc, vec_id) total order
    */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, labelCol: String, k: Int): DataFrame = {
    graft.plans.GraftExtensions.ensureRegistered(corpus.sparkSession)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
      col(labelCol).as("q_label"))
    val c = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("c_vec"),
      col(labelCol).as("neg_label"))
    val scored = c.join(broadcast(q),
        col("vec_id") =!= col("query_id") &&
          col("neg_label") =!= col("q_label"))
      .select(col("query_id"), col("q_label"), col("vec_id"),
        col("neg_label"), round(nativeCosine(col("q_vec"), col("c_vec")), 6)
          .as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
  }

  def bruteTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    graft.plans.GraftExtensions.ensureRegistered(corpus.sparkSession)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val c = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("c_vec"))
    val scored = c.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(nativeCosine(col("q_vec"), col("c_vec")), 6).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
  }

  /** Deterministic pseudo-uniform in [-1, 1) for plane (b, j): splitmix64
    * finalizer over (seed, b, j) — computed once on the driver, shipped as a
    * literal plane matrix (recomputing hashes per row × bit × element cost
    * ~2000 hash calls per row; the planes are constants).
    */
  private def planeComponent(seed: Long, b: Int, j: Int): Double = {
    var z = seed + 0x9e3779b97f4a7c15L * (b * 1048576L + j + 1)
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z = z ^ (z >>> 31)
    (java.lang.Long.remainderUnsigned(z, 100000L).toDouble / 50000.0) - 1.0
  }

  /** Tight primitive-array unit-vector dot as a UDF: higher-order-function
    * expressions (`zip_with`/`aggregate`) are interpreted per element —
    * fine for per-row scoring, ~100× too slow inside an O(n²) pair join.
    */
  private def unwrap(s: Seq[Double]): Array[Double] = (s: Any) match {
    case w: scala.collection.immutable.ArraySeq.ofDouble => w.unsafeArray
    case w: scala.collection.mutable.ArraySeq.ofDouble   => w.array
    case _ => s.toArray
  }
  /** Unit-normalized double vector (one HOF pass per row — cheap). */
  private def unitVec(vec: Column): Column =
    transform(vec, x => x.cast("double") / norm(vec))

  /** Embedding-cosine near-duplicate pairs: all (id_a, id_b, cos) with
    * cosine ≥ `threshold`, id_a < id_b — the exact O(n²) baseline.
    *
    * One side is broadcast as primitive arrays and each partition streams
    * the other side against it in a tight flatMap, emitting ONLY surviving
    * pairs — a join would materialize n²/2 rows each carrying two vectors
    * (the row-copy cost dwarfs the arithmetic). Requires the corpus to fit
    * in a broadcast (fine into the millions of vectors); beyond that use
    * [[cosinePairsLSH]], which never forms the quadratic pair space.
    */
  def cosinePairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, maxBroadcastRows: Int = 1000000): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val unit = fanOut(df)
      .select(col(idCol).cast("long").as("id"), unitVec(col(vecCol)).as("u"))
      .as[(Long, Seq[Double])]
    // guard rail on the driver collect: a count() pass first (Catalyst prunes
    // the vector projection away, so this is near-free), THEN one fully
    // parallel collect — a limit(cap+1).collect() would execute as an
    // incremental CollectLimit that serializes the unit-vector computation
    // onto a handful of tasks
    val cnt = unit.count()
    require(cnt <= maxBroadcastRows,
      s"cosinePairs is the exact O(n²) baseline and collects the corpus to " +
        s"the driver; corpus has $cnt rows > maxBroadcastRows=$maxBroadcastRows — " +
        "use cosinePairsLSH (banded equi-join, no driver collect) at scale")
    val local = unit.collect().map { case (id, u) => (id, unwrap(u)) }
    val bc = spark.sparkContext.broadcast(local)
    unit.mapPartitions { it =>
      val corpus = bc.value
      it.flatMap { case (ida, uaSeq) =>
        val ua = unwrap(uaSeq)
        corpus.iterator.flatMap { case (idb, ub) =>
          if (idb <= ida) None
          else {
            var d = 0.0
            var i = 0
            while (i < ua.length) { d += ua(i) * ub(i); i += 1 }
            val c = BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
            if (c >= threshold) Some((ida, idb, c)) else None
          }
        }
      }
    }.toDF("id_a", "id_b", "cos")
    // no trailing orderBy: a global sort (sampling job + range shuffle)
    // is caller's business — composed pipelines (removeNearDuplicates)
    // would otherwise pay it for nothing
  }

  /** Scale path for embedding near-dup: hyperplane-LSH bucketing prunes the
    * pair space (only band-colliding pairs are scored), then exact cosine
    * verification. Recall < 1 by construction.
    *
    * The band self-join is quadratic in bucket size, so buckets above
    * `maxBucketSize` are dropped before the join (the same count-filter-join
    * cap every other banded self-join here uses — [[Dedup.minhashPairs]],
    * [[Dedup.jaccardPairs]], [[Dedup.simhashPairs]]): a template-heavy or
    * near-constant-vector corpus concentrates mass in a few buckets and
    * would otherwise degenerate toward O(n²) pair rows each carrying two
    * vectors. A vector only loses recall if ALL of its `bands` buckets
    * overflow. Band keys are `xxhash64` of the bit-slice, so the cap's
    * count and the join shuffle 8-byte longs, not bit arrays; hash
    * collisions can only ADD candidates, which the exact cosine filter
    * then removes — precision is unaffected.
    */
  def cosinePairsLSH(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nBits: Int = 64, bands: Int = 8,
      seed: Long = 42L, maxBucketSize: Int = 1000): DataFrame = {
    require(nBits % bands == 0, "bands must divide nBits")
    graft.plans.GraftExtensions.ensureRegistered(df.sparkSession)
    // band keys need enough bits to discriminate: nBits/bands is the key
    // width, so 64/8 → 8-bit keys (256 buckets per band)
    val rows = nBits / bands
    val dim = df.select(size(col(vecCol))).limit(1).head().getInt(0)
    val unit = fanOut(df).select(col(idCol).as("id"), unitVec(col(vecCol)).as("u"))
    val sig = hyperplaneSignature(col("u"), nBits, dim, seed)
    val banded = unit.select(col("id"), col("u"), posexplode(
      transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(slice(sig, b * rows + 1, lit(rows)))))
      .as(Seq("band", "bkey")))
    // cap pathological buckets before the self-join
    val small = banded.groupBy("band", "bkey").agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") <= maxBucketSize).select("band", "bkey")
    val pruned = banded.join(small, Seq("band", "bkey"))
    val a = pruned.select(col("band"), col("bkey"), col("id").as("id_a"), col("u").as("ua"))
    val b = pruned.select(col("band"), col("bkey"), col("id").as("id_b"), col("u").as("ub"))
    // score BEFORE dedup so the distinct shuffles slim (id, id, cos) rows,
    // not pair rows carrying two vectors; the dot is deterministic so
    // band-duplicate pairs dedup exactly (unit vectors: dot = cosine)
    a.join(b, Seq("band", "bkey")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(nativeDot(col("ua"), col("ub")), 6).as("cos"))
      .filter(col("cos") >= threshold)
      .dropDuplicates("id_a", "id_b")
  }

  /** Embedding-cosine near-duplicate removal end-to-end: cosine pairs →
    * connected components → keep the minimum id per component (plus every
    * vector with no near-duplicate) — the embedding twin of
    * [[graft.ops.Dedup.removeNearDuplicates]].
    *
    * `exact = true` (default) uses the guarded O(n²) [[cosinePairs]]
    * baseline — deterministic, so the result is oracle-checkable;
    * `exact = false` swaps in [[cosinePairsLSH]] (banded equi-join, recall
    * < 1), the path that survives a corpus too large to broadcast —
    * `maxBucketSize` caps its LSH buckets so a near-constant-vector corpus
    * cannot degenerate the candidate join to O(n²). The component labeling
    * is [[graft.ops.Dedup.connectedComponentsLSS]] (O(log n) rounds
    * regardless of duplicate-chain depth).
    */
  def removeNearDuplicates(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, exact: Boolean = true,
      checkpointDir: Option[String] = None,
      maxBucketSize: Int = 1000): DataFrame = {
    val pairs =
      (if (exact) cosinePairs(df, idCol, vecCol, threshold)
       else cosinePairsLSH(df, idCol, vecCol, threshold,
         maxBucketSize = maxBucketSize))
        .select("id_a", "id_b")
    // reserved component-label name: unlike the documents table, embedding
    // frames routinely carry their own `label` (class) column
    val labels = graft.ops.Dedup.connectedComponentsLSS(pairs,
        checkpointDir = checkpointDir)
      .withColumnRenamed("id", idCol).withColumnRenamed("label", "__nd_label")
    df.join(labels, Seq(idCol), "left")
      .filter(col("__nd_label").isNull || col("__nd_label") === col(idCol))
      .drop("__nd_label")
  }

  /** Random-hyperplane signature: `nBits` sign bits as an array<int>.
    * `dim` is the embedding dimensionality (plane matrix is nBits × dim).
    * Implemented as a closure UDF over the precomputed plane matrix: the
    * equivalent higher-order-function expression is interpreted per element
    * AND re-evaluated per downstream reference (e.g. once per band).
    */
  def hyperplaneSignature(vec: Column, nBits: Int, dim: Int, seed: Long = 42L): Column = {
    val planes = Array.tabulate(nBits, dim)((b, j) => planeComponent(seed, b, j))
    val f = udf { (v: Seq[Double]) =>
      val x = unwrap(v)
      Array.tabulate(nBits) { b =>
        val w = planes(b)
        var s = 0.0
        var i = 0
        while (i < x.length && i < w.length) { s += x(i) * w(i); i += 1 }
        if (s >= 0) 1 else 0
      }
    }
    f(vec.cast("array<double>"))
  }

  /** IVF (inverted-file) approximate top-k — the k-means-quantizer scale
    * path alongside [[lshTopK]]: corpus vectors are assigned to their
    * nearest of `nCentroids` coarse centroids (the inverted lists); each
    * query probes only its `nProbe` nearest lists, so exact scoring
    * touches ~nProbe/nCentroids of the corpus instead of all of it.
    *
    * Training is spherical-k-means (Lloyd on unit vectors, dot = cosine)
    * over a deterministic hash-ordered sample collected to the driver —
    * `sampleSize` × dim doubles of driver traffic, FIXED-size regardless
    * of corpus size — and the centroids ship back as one broadcast. List
    * assignment and probe selection are per-row closures over that
    * broadcast; the only shuffle is the (list, candidate) equi-join.
    * Recall < 1 for nProbe < nCentroids; nProbe == nCentroids is exact
    * (equals [[bruteTopK]], asserted in SimilaritySpec).
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nCentroids: Int = 64, nProbe: Int = 8,
      sampleSize: Int = 4096, iters: Int = 10, seed: Long = 42L): DataFrame = {
    require(nProbe >= 1 && nProbe <= nCentroids)
    graft.plans.GraftExtensions.ensureRegistered(corpus.sparkSession)
    val unitCorpus = fanOut(corpus)
      .select(col(idCol).as("vec_id"), unitVec(col(vecCol)).as("cu"))
    // deterministic pseudo-random sample: hash order, id tiebreak. The id
    // and seed hash as SEPARATE xxhash64 args so any id type works — an
    // arithmetic id+seed would null out on string ids and silently
    // degenerate the sample to lowest-id order, biasing centroid training
    val sample = unitCorpus
      .orderBy(xxhash64(col("vec_id"), lit(seed)), col("vec_id"))
      .limit(sampleSize)
      .select("cu").collect().map(r => unwrap(r.getSeq[Double](0)))
    require(sample.nonEmpty, "ivfTopK needs a non-empty corpus")
    val kC = math.min(nCentroids, sample.length)
    val dim = sample.head.length
    // spherical Lloyd: init = first kC hash-ordered sample points
    var centroids = Array.tabulate(kC)(i => sample(i).clone())
    for (_ <- 1 to iters) {
      val sums = Array.fill(kC)(new Array[Double](dim))
      val counts = new Array[Int](kC)
      sample.foreach { v =>
        var best = 0; var bestDot = Double.NegativeInfinity
        var c = 0
        while (c < kC) {
          var d = 0.0; var i = 0
          while (i < dim) { d += v(i) * centroids(c)(i); i += 1 }
          if (d > bestDot) { bestDot = d; best = c }
          c += 1
        }
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
        counts(best) += 1
      }
      centroids = Array.tabulate(kC) { c =>
        if (counts(c) == 0) centroids(c) // empty list keeps its centroid
        else {
          val s = sums(c)
          var n2 = 0.0; var i = 0
          while (i < dim) { n2 += s(i) * s(i); i += 1 }
          val nrm = math.sqrt(n2)
          if (nrm == 0.0) centroids(c)
          else Array.tabulate(dim)(i => s(i) / nrm)
        }
      }
    }
    val bc = corpus.sparkSession.sparkContext.broadcast(centroids)
    def dots(v: Array[Double]): Array[Double] = {
      val cs = bc.value
      Array.tabulate(cs.length) { c =>
        var d = 0.0; var i = 0
        while (i < v.length && i < cs(c).length) { d += v(i) * cs(c)(i); i += 1 }
        d
      }
    }
    val assignUdf = udf { (v: Seq[Double]) =>
      val d = dots(unwrap(v))
      var best = 0; var i = 1
      while (i < d.length) { if (d(i) > d(best)) best = i; i += 1 }
      best
    }
    val probeUdf = udf { (v: Seq[Double]) =>
      dots(unwrap(v)).zipWithIndex.sortBy(p => (-p._1, p._2))
        .take(nProbe).map(_._2)
    }
    val lists = unitCorpus.withColumn("list", assignUdf(col("cu")))
    // the query side is broadcast (|queries| × nProbe rows, each carrying a
    // dim-sized vector) — like bruteTopK/lshTopK this assumes a SMALL query
    // set; for query sets past broadcast size drop the hint and let the
    // (list, candidate) equi-join shuffle both sides instead
    val probes = fanOut(queries)
      .select(col(idCol).as("query_id"), unitVec(col(vecCol)).as("qu"))
      .select(col("query_id"), col("qu"), explode(probeUdf(col("qu"))).as("list"))
    val cand = lists.join(broadcast(probes), Seq("list"))
      .filter(col("vec_id") =!= col("query_id"))
    val scored = cand.select(col("query_id"), col("vec_id"),
      round(nativeDot(col("qu"), col("cu")), 6).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
  }

  /** LSH-bucketed approximate top-k: vectors sharing any signature band are
    * candidates; candidates get exact cosine; top-k per query among them.
    * Returns (query_id, vec_id, cos, rn). Recall < 1 by construction —
    * verify against [[bruteTopK]] on a sample, not an equality oracle.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nBits: Int = 16, bands: Int = 4,
      seed: Long = 42L): DataFrame = {
    require(nBits % bands == 0, "bands must divide nBits")
    graft.plans.GraftExtensions.ensureRegistered(corpus.sparkSession)
    val rows = nBits / bands
    val dim = queries.select(size(col(vecCol))).limit(1).head().getInt(0)
    def withBands(df: DataFrame, id: String, vec: String) = {
      val sig = hyperplaneSignature(col(vec), nBits, dim, seed)
      df.select(col(id), col(vec), posexplode(
        transform(sequence(lit(0), lit(bands - 1)),
          b => slice(sig, b * rows + 1, lit(rows)))).as(Seq("band", "bkey")))
    }
    val c = withBands(corpus.select(col(idCol).as("vec_id"), col(vecCol).as("c_vec")),
      "vec_id", "c_vec")
    val q = withBands(queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec")),
      "query_id", "q_vec")
    val cand = c.join(broadcast(q), Seq("band", "bkey"))
      .filter(col("vec_id") =!= col("query_id"))
      .select("query_id", "vec_id", "q_vec", "c_vec")
      .dropDuplicates("query_id", "vec_id")
    // nativeCosine: codegen'd array_dot, same left-to-right summation as the
    // interpreted HOF cosine (bit-identical), ~an order of magnitude faster
    val scored = cand.select(col("query_id"), col("vec_id"),
      round(nativeCosine(col("q_vec"), col("c_vec")), 6).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
  }

  /** Engine-portable hyperplane-LSH top-k — [[lshTopK]]'s exact-replay
    * twin (the q278/q279 portable-MinHash discipline): hyperplanes are
    * md5-parity Rademacher ±1 rows (the [[randomProject]] matrix), so
    * signature bits, band buckets, the candidate set, and the cosine
    * rescoring all replay verbatim in any ANSI engine — a FULL
    * hash-equality oracle for the LSH search path, where the splitmix64
    * planes of [[lshTopK]] (the fast default) are not expressible.
    *
    * Same shapes as [[lshTopK]]: signature = nBits codegen'd array_dot
    * sign tests against literal ±1 rows, band slices explode to a
    * (band, bucket) equi-join against the broadcast queries, exact
    * cosine rescoring on the 6-digit grid with the id tiebreak.
    */
  def lshTopKPortable(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, inDim: Int, nBits: Int = 16,
      bands: Int = 4): DataFrame = {
    require(nBits % bands == 0, "bands must divide nBits")
    require(k >= 1 && inDim >= 1 && nBits >= 1,
      s"need k, inDim, nBits >= 1, got k=$k inDim=$inDim nBits=$nBits")
    graft.plans.GraftExtensions.ensureRegistered(corpus.sparkSession)
    val rows = nBits / bands
    def withBands(df: DataFrame, id: String, vec: String) = {
      val sig = portableSigBits(col(vec), inDim, nBits)
      df.select(col(id), col(vec), posexplode(
        transform(sequence(lit(0), lit(bands - 1)),
          b => slice(sig, b * rows + 1, lit(rows)))).as(Seq("band", "bkey")))
    }
    // the portable sign-projection is inDim x nBits multiply-adds PER
    // CORPUS ROW — fan out so a one-row-group source doesn't run it on
    // one core (queries stay tiny, no need)
    val c = withBands(fanOut(corpus).select(col(idCol).as("vec_id"),
      col(vecCol).as("c_vec")), "vec_id", "c_vec")
    val q = withBands(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("q_vec")), "query_id", "q_vec")
    val cand = c.join(broadcast(q), Seq("band", "bkey"))
      .filter(col("vec_id") =!= col("query_id"))
      .select("query_id", "vec_id", "q_vec", "c_vec")
      .dropDuplicates("query_id", "vec_id")
    val scored = cand.select(col("query_id"), col("vec_id"),
      round(nativeCosine(col("q_vec"), col("c_vec")), 6).as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
  }

  /** Signature bits for the portable LSH family: bit b = sign of the
    * dot against the md5-parity ±1 hyperplane row b — one codegen'd
    * array_dot per bit, exact-replayable in ANSI SQL.
    */
  private def portableSigBits(vec: Column, inDim: Int, nBits: Int): Column =
    array((0 until nBits).map { b =>
      val signs = (0 until inDim).map(j => rademacherSign(b, j))
      when(call_function("array_dot", vec.cast("array<double>"),
        typedLit(signs)) >= 0, lit(1)).otherwise(lit(0))
    }: _*)

  /** Engine-portable cosine near-duplicate PAIRS — [[cosinePairsLSH]]'s
    * exact-replay twin, same discipline as [[lshTopKPortable]]: md5-parity
    * hyperplanes, band-bucket self-join with the bucket-size cap, cosine
    * on the 6-digit grid, id_a < id_b.
    */
  def cosinePairsLSHPortable(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, inDim: Int, nBits: Int = 16, bands: Int = 4,
      maxBucketSize: Int = 1000): DataFrame = {
    require(nBits % bands == 0, "bands must divide nBits")
    require(inDim >= 1 && maxBucketSize >= 1)
    graft.plans.GraftExtensions.ensureRegistered(df.sparkSession)
    val rows = nBits / bands
    val sig = portableSigBits(col(vecCol), inDim, nBits)
    val banded = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => slice(sig, b * rows + 1, lit(rows)))).as(Seq("band", "bkey")))
    val small = banded.groupBy("band", "bkey").agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") <= maxBucketSize).select("band", "bkey")
    val pruned = banded.join(small, Seq("band", "bkey"))
    val a = pruned.select(col("band"), col("bkey"),
      col("id").as("id_a"), col("v").as("va"))
    val b = pruned.select(col("band"), col("bkey"),
      col("id").as("id_b"), col("v").as("vb"))
    a.join(b, Seq("band", "bkey")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(nativeCosine(col("va"), col("vb")), 6).as("cos"))
      .filter(col("cos") >= threshold)
      .dropDuplicates("id_a", "id_b")
  }

  /** md5-derived Rademacher sign for projection cell (j, k): ±1 from the
    * parity of the q236 15-hex-digit mapping of "j#k". Computed DRIVER
    * side — the projection matrix becomes plan literals.
    */
  private def rademacherSign(j: Int, k: Int): Double = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$j#$k".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(15)
    if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1.0 else -1.0
  }

  /** Johnson–Lindenstrauss random projection (Achlioptas 2003 ±1
    * variant): compress `inDim`-dim embeddings to `outDim` dims with
    * pairwise distances preserved to within ε ≈ √(8·ln n / outDim) —
    * the cheap front-end that makes downstream k-means / LSH / exact
    * rescoring run on a fraction of the bytes at 100 TB.
    *
    * The ±1/√outDim projection matrix is md5-derived (deterministic,
    * engine-reproducible, no RNG state) and materializes as PLAN
    * LITERALS: each output component is one [[graft.functions.ArrayDot]]
    * against a literal sign row — a pure projection, no UDF, no shuffle,
    * no runtime hashing, and O(outDim) generated code (the previous
    * outDim·inDim unrolled signed sum blew janino's 64 KB method limit
    * at 8×64 = 512 terms; the native dot loop is bit-identical —
    * left-to-right accumulation, commutative per-element product).
    *
    * @return `df` with `outCol` = array<double> of size `outDim`
    */
  def randomProject(df: DataFrame, vecCol: String, inDim: Int,
      outDim: Int, outCol: String = "projection"): DataFrame = {
    require(inDim >= 1 && outDim >= 1 && outDim <= inDim,
      s"need 1 <= outDim <= inDim, got inDim=$inDim outDim=$outDim")
    graft.plans.GraftExtensions.ensureRegistered(df.sparkSession)
    val scale = 1.0 / math.sqrt(outDim.toDouble)
    val vecD = col(vecCol).cast("array<double>")
    // short vectors project to NULL components (array_dot would silently
    // truncate; the unrolled element_at form this replaced propagated
    // null — keep that malformed-row visibility)
    val comps = (0 until outDim).map { j =>
      val signs = (0 until inDim).map(k => rademacherSign(j, k))
      when(size(vecD) >= inDim,
        call_function("array_dot", vecD, typedLit(signs)) * lit(scale))
    }
    df.withColumn(outCol, array(comps: _*))
  }
}
