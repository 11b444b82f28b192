package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (Jégou, Douze, Schmid 2011, "Product
  * Quantization for Nearest Neighbor Search"): compress `inDim`-dim
  * embeddings to `m` small integer codes — one per disjoint subspace —
  * by nearest-centroid assignment against per-subspace codebooks of `k`
  * centroids. At 100 TB this is THE memory path for similarity search:
  * a 64-dim float vector (256 B) becomes m = 8 bytes of codes, and
  * query scoring touches only the codes plus an m×k lookup table per
  * query — never the original vectors.
  *
  * Spark-first shapes:
  *  - training = m independent per-subspace Lloyd fits, reusing
  *    [[Cluster.kmeans]] (literal-centroid codegen'd assignment, ONE
  *    (cluster, dim) aggregation per iteration);
  *  - encoding = a pure projection: per subspace, argmin over k
  *    centroids by PARTIAL distance (−2·x·c + ‖c‖²; ‖x‖² shifts every
  *    candidate equally) via the native `pq_codes` kernel
  *    ([[graft.functions.PQCodes]]) — codebook as a reference object, so
  *    generated code is O(1) in m·k; no UDF, no shuffle;
  *  - search = the codes frame exploded to (id, s, code), broadcast-join
  *    the per-query m×k lookup table, ONE (query, id) sum, rank window.
  *    Per-subspace constant shifts cancel across documents (every doc
  *    contributes exactly one code per subspace), so partial-distance
  *    LUTs rank identically to true distances; the true squared distance
  *    is restored by adding ‖q‖² at the end.
  */
object Quantize {

  /** Per-subspace codebooks: `centroids(s)(c)` is the `subDim`-dim
    * centroid for code `c` of subspace `s`.
    */
  final case class PQCodebook(m: Int, k: Int, subDim: Int,
      centroids: Array[Array[Array[Double]]]) {
    require(centroids.length == m &&
      centroids.forall(s => s.length == k && s.forall(_.length == subDim)))
  }

  private def checkDims(inDim: Int, m: Int): Int = {
    require(m >= 1 && inDim >= m && inDim % m == 0,
      s"m must divide inDim, got inDim=$inDim m=$m")
    inDim / m
  }

  /** Train per-subspace codebooks by Lloyd's (m independent
    * [[Cluster.kmeans]] fits over the sliced subvectors — md5-seeded,
    * deterministic). m is small (8–16), so the m sequential fits cost
    * m·iters scans of an `inDim/m`-wide projection.
    */
  def train(df: DataFrame, idCol: String, vecCol: String, inDim: Int,
      m: Int, k: Int, maxIter: Int = 10): PQCodebook = {
    val d = checkDims(inDim, m)
    val cents = (0 until m).map { s =>
      val sub = df.select(col(idCol),
        slice(col(vecCol).cast("array<double>"), s * d + 1, d).as("__sub"))
      Cluster.kmeans(sub, idCol, "__sub", k, maxIter).centroids
    }.toArray
    PQCodebook(m, k, d, cents)
  }

  /** Closed-form codebooks from the k smallest ids' subvectors — no
    * iteration, exactly replayable in SQL (the oracle-gate path; k-means
    * codebooks are strictly better quantizers, same encode/search code).
    */
  def trainSeeded(df: DataFrame, idCol: String, vecCol: String,
      inDim: Int, m: Int, k: Int): PQCodebook = {
    val d = checkDims(inDim, m)
    require(k >= 1, s"need k >= 1, got $k")
    val seeds = df.filter(col(vecCol).isNotNull)
      .orderBy(col(idCol)).limit(k)
      .select(col(vecCol).cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    require(seeds.length == k, s"fewer than $k non-null vectors")
    PQCodebook(m, k, d,
      Array.tabulate(m)(s => seeds.map(_.slice(s * d, s * d + d))))
  }

  /** Quantize every vector to its m nearest-centroid codes — a pure
    * literal-codebook projection (`outCol` = array<int> of length m).
    * Argmin ties break to the LOWER code, deterministically.
    */
  def encode(df: DataFrame, vecCol: String, cb: PQCodebook,
      outCol: String = "codes"): DataFrame = {
    graft.plans.GraftExtensions.ensureRegistered(df.sparkSession)
    df.withColumn(outCol, call_function("pq_codes",
      col(vecCol).cast("array<double>"), cbLit(cb)))
  }

  /** Codebook as one nested literal — the native pq_* kernels iterate it
    * as a reference object, so generated code stays O(1) in m·k (the
    * previous m·k unrolled struct-argmin blew janino's 64 KB method limit
    * at m·k = 128).
    */
  private def cbLit(cb: PQCodebook): Column =
    typedLit(cb.centroids.map(_.map(_.toSeq).toSeq).toSeq)

  /** Asymmetric-distance top-k: rank every encoded vector against every
    * query by the PQ approximation ‖q − decode(codes)‖², computed from
    * the codes alone. The per-query lookup table ((query, s, c) →
    * partial distance, m·k rows per query) broadcast-joins the exploded
    * codes; ONE (query, id) aggregation sums the m table hits; a
    * query-partitioned rank window takes k. Rank order uses the 6-digit
    * distance grid with an id tiebreak — deterministic on any
    * partitioning.
    *
    * @param queries small frame (idCol, vecCol) — one LUT row set each
    * @return (query_id, vec_id, adist2, rn) — adist2 = approximate
    *         squared distance on the 6-digit grid, rn = 1..k
    */
  def topK(codes: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, codesCol: String, cb: PQCodebook, k: Int): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    graft.plans.GraftExtensions.ensureRegistered(codes.sparkSession)
    val long = codes.select(col(idCol).as("vec_id"),
      posexplode(col(codesCol)).as(Seq("s", "c")))
    rescore(long, queryLut(queries, idCol, vecCol, cb),
      joinKeys = Seq("s", "c"), k)
  }

  /** IVF-PQ search (the faiss-standard scale path): a coarse m=1
    * quantizer buckets every vector; each query probes only its
    * `nProbe` nearest coarse cells, and PQ asymmetric-distance
    * rescoring runs on that candidate slice alone. At 100 TB this is
    * the difference between scanning every code and scanning
    * nProbe/k_coarse of them — with recall bounded by how often the true
    * neighbor's cell is probed (raise nProbe to trade time for recall).
    *
    * Shapes: assignment is the same pq_codes projection (m=1 codebook);
    * the probe list is queries×nProbe rows (broadcast); candidates come
    * from ONE equi-join on the cluster id; rescoring reuses the q274
    * LUT machinery with the query id folded into the join key.
    *
    * @return (query_id, vec_id, adist2, rn) like [[topK]] — rn ranks
    *         only within the PROBED cells
    */
  def topKIvf(df: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, coarse: PQCodebook, cb: PQCodebook, nProbe: Int,
      k: Int): DataFrame = {
    require(coarse.m == 1, s"coarse quantizer must have m=1, got ${coarse.m}")
    require(nProbe >= 1 && nProbe <= coarse.k,
      s"need 1 <= nProbe <= ${coarse.k}, got $nProbe")
    require(k >= 1, s"need k >= 1, got $k")
    graft.plans.GraftExtensions.ensureRegistered(df.sparkSession)
    // inverted-file assignment: one coarse code per vector
    val assigned = encode(df, vecCol, coarse, outCol = "__coarse")
      .withColumn("__cluster", element_at(col("__coarse"), 1))
    val codes = encode(assigned, vecCol, cb)
    // probe list: per query the nProbe nearest coarse cells, ranked on
    // the raw partial distance with the lower-cell tiebreak (the q163
    // argmin discipline, extended to rank <= nProbe)
    val q0 = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("__q"))
    val wp = Window.partitionBy("query_id")
      .orderBy(col("__d"), col("__cluster"))
    val probes = q0.select(col("query_id"),
        posexplode(element_at(
          call_function("pq_partial_dists", col("__q"), cbLit(coarse)), 1))
          .as(Seq("__cluster", "__d")))
      .withColumn("__rk", row_number().over(wp))
      .filter(col("__rk") <= nProbe)
      .select(col("query_id"), col("__cluster"))
    val long = codes.join(broadcast(probes), Seq("__cluster"))
      .select(col("query_id"), col(idCol).as("vec_id"),
        posexplode(col("codes")).as(Seq("s", "c")))
    rescore(long, queryLut(queries, idCol, vecCol, cb),
      joinKeys = Seq("query_id", "s", "c"), k)
  }

  /** Coarse-assign `df` and append the RESIDUAL vector x − c_cell —
    * the IVF-PQ refinement (Jégou et al. 2011, the FAISS IVFPQ layout):
    * residuals concentrate near 0 with far less variance than raw
    * vectors, so the same m·k code budget quantizes them much more
    * accurately. Pure literal-centroid column arithmetic: the coarse
    * argmin through the native pq_codes kernel, the subtraction a
    * zip_with against `element_at` of the centroid-table literal.
    *
    * @return df + (`clusterCol` int, `resCol` array<double>)
    */
  def residualize(df: DataFrame, vecCol: String, coarse: PQCodebook,
      clusterCol: String = "__cluster",
      resCol: String = "__res"): DataFrame = {
    require(coarse.m == 1, s"coarse quantizer must have m=1, got ${coarse.m}")
    val centLit = typedLit(coarse.centroids(0).map(_.toSeq).toSeq)
    encode(df, vecCol, coarse, outCol = "__coarse0")
      .withColumn(clusterCol, element_at(col("__coarse0"), 1))
      .drop("__coarse0")
      .withColumn(resCol, zip_with(col(vecCol).cast("array<double>"),
        element_at(centLit, col(clusterCol) + 1), (a, b) => a - b))
  }

  /** [[topKIvf]] with RESIDUAL quantization — the production IVF-PQ:
    * codes quantize x − c_cell, and the per-query lookup table is built
    * per PROBED CELL from the query's own residual q − c_cell, since
    * ‖q − (c_cell + decode)‖² = ‖(q − c_cell) − decode‖². Same scale
    * shape as [[topKIvf]] — probe list and LUT are model-sized (the LUT
    * grows by the nProbe factor only), candidates flow through one
    * broadcast join + one (query, id) aggregation.
    *
    * Train `cb` on the residuals ([[residualize]] → [[train]] over
    * `resCol`), not the raw vectors. The fidelity win needs LLOYD
    * codebooks: with k-means centroids the residual variance is the
    * within-cluster variance ≤ total variance (the k-means
    * decomposition), so residual codes reconstruct tighter at the same
    * budget (QuantizeSpec measures it); with arbitrary SEEDED centroids
    * the coarse step can move a structureless vector AWAY from its
    * cell's seed and the residual is WORSE — seeded codebooks are the
    * oracle-replay path, not the quality path.
    */
  def topKIvfResidual(df: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, coarse: PQCodebook, cb: PQCodebook, nProbe: Int,
      k: Int): DataFrame = {
    require(coarse.m == 1, s"coarse quantizer must have m=1, got ${coarse.m}")
    require(nProbe >= 1 && nProbe <= coarse.k,
      s"need 1 <= nProbe <= ${coarse.k}, got $nProbe")
    require(k >= 1, s"need k >= 1, got $k")
    graft.plans.GraftExtensions.ensureRegistered(df.sparkSession)
    val centLit = typedLit(coarse.centroids(0).map(_.toSeq).toSeq)
    val codes = encode(residualize(df, vecCol, coarse), "__res", cb)
    // probed cells + the query residual per cell, in one projection
    val wp = Window.partitionBy("query_id")
      .orderBy(col("__d"), col("__cluster"))
    val probes = queries
      .select(col(idCol).as("query_id"),
        col(vecCol).cast("array<double>").as("__q"))
      .select(col("query_id"), col("__q"),
        posexplode(element_at(
          call_function("pq_partial_dists", col("__q"), cbLit(coarse)), 1))
          .as(Seq("__cluster", "__d")))
      .withColumn("__rk", row_number().over(wp))
      .filter(col("__rk") <= nProbe)
      .withColumn("__qres", zip_with(col("__q"),
        element_at(centLit, col("__cluster") + 1), (a, b) => a - b))
    // per-(query, cell) LUT over the query RESIDUAL; ‖q − c_cell‖²
    // rides along as the constant term
    val lut = probes.select(col("query_id"), col("__cluster"),
        call_function("array_dot", col("__qres"), col("__qres"))
          .as("__qq"),
        posexplode(call_function("pq_partial_dists", col("__qres"),
          cbLit(cb))).as(Seq("s", "__row")))
      .select(col("query_id"), col("__cluster"), col("__qq"),
        col("s"), posexplode(col("__row")).as(Seq("c", "__pd")))
    val long = codes
      .join(broadcast(probes.select("query_id", "__cluster")),
        Seq("__cluster"))
      .select(col("query_id"), col("__cluster"),
        col(idCol).as("vec_id"), posexplode(col("codes")).as(Seq("s", "c")))
    rescore(long, lut,
      joinKeys = Seq("query_id", "__cluster", "s", "c"), k)
  }

  /** Per-query LUT: pd(s, c) = −2·q_s·ct + ‖ct‖² (+ ‖q‖² restores the
    * true squared distance after the m-term sum).
    */
  private def queryLut(queries: DataFrame, idCol: String, vecCol: String,
      cb: PQCodebook): DataFrame = {
    val q0 = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("__q"))
    q0.select(col("query_id"),
        call_function("array_dot", col("__q"), col("__q")).as("__qq"),
        posexplode(call_function("pq_partial_dists", col("__q"), cbLit(cb)))
          .as(Seq("s", "__row")))
      .select(col("query_id"), col("__qq"),
        col("s"), posexplode(col("__row")).as(Seq("c", "__pd")))
  }

  /** Shared rescoring tail: broadcast-join the LUT, ONE (query, id)
    * aggregation, rank on the 6-digit grid with the id tiebreak.
    */
  private def rescore(long: DataFrame, lut: DataFrame,
      joinKeys: Seq[String], k: Int): DataFrame = {
    val scored = long.join(broadcast(lut), joinKeys)
      .groupBy("query_id", "vec_id")
      .agg((sum("__pd") + first("__qq")).as("__ad"))
      .select(col("query_id"), col("vec_id"),
        round(col("__ad"), 6).as("adist2"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("adist2"), col("vec_id"))
    scored.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
  }
}
