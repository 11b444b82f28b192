package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact, n-gram
  * Jaccard, MinHash+LSH, and SimHash near-duplicate detection.
  *
  * Scale design (the point of every choice here):
  *  - exact dedup is a hash aggregation on a digest, not on the full text —
  *    the shuffle carries 16-byte keys, not documents;
  *  - Jaccard / MinHash candidate generation shuffles (shingle → doc) pairs
  *    with frequency capping, so a stop-shingle shared by every document
  *    cannot create an O(n²) join explosion;
  *  - MinHash signatures are computed with k min-aggregates in ONE pass over
  *    exploded shingles (map-side partial min keeps the shuffle tiny), then
  *    LSH banding turns near-dup search into an equi-join on band keys;
  *  - SimHash pair generation uses the pigeonhole block trick: hamming ≤ t
  *    implies equality on at least one of t+1 bit-blocks, so candidates come
  *    from t+1 equi-joins instead of a cross join, verified with
  *    `bit_count(a XOR b)`.
  */
object Dedup {

  /** Exact duplicate groups by content digest: one row per distinct text,
    * with the representative (minimum) id and the duplicate count.
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("digest"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Word n-gram shingles of `textCol` as an array column (distinct).
    * Documents shorter than `n` tokens yield an empty array (a bare
    * `sequence(0, size-n)` would descend for negative bounds).
    */
  def shingleExpr(text: Column, n: Int): Column = {
    val toks = split(text, "\\s+")
    when(size(toks) < n, array().cast("array<string>")).otherwise(
      array_distinct(
        transform(sequence(lit(0), size(toks) - n),
          i => array_join(slice(toks, i + 1, lit(n)), " "))))
  }

  /** 64-bit hashes of the word n-gram shingles (distinct), built without
    * materializing shingle strings: xxhash64 over token-array slices. Set
    * operations on shingles (Jaccard, MinHash) are collision-insensitive at
    * 64 bits, and the exploded rows carry longs instead of n-word strings.
    */
  def shingleHashExpr(text: Column, n: Int): Column = {
    val toks = split(text, "\\s+")
    when(size(toks) < n, array().cast("array<bigint>")).otherwise(
      array_distinct(
        transform(sequence(lit(0), size(toks) - n),
          i => xxhash64(slice(toks, i + 1, lit(n))))))
  }

  /** Near-duplicate pairs by exact n-gram Jaccard similarity ≥ `threshold`.
    * Returns (id_a, id_b, jaccard) with id_a < id_b.
    *
    * Candidate generation uses PPJoin-style **prefix filtering**: under any
    * global total order on shingles (here: xxhash64 order), two sets with
    * Jaccard ≥ t MUST share a shingle among each set's first
    * ⌊(1−t)·|S|⌋+1 shingles — so only the prefix index is self-joined,
    * never the full posting lists, and the pair-count shuffle runs over the
    * (small) verified-candidate set instead of every co-shingle pair.
    * Lossless for the reported threshold: jaccard here uses full set sizes
    * with hot-shingle-filtered intersections, which lower-bounds the
    * filtered-set Jaccard the prefix filter is applied to.
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String, n: Int = 3,
      threshold: Double = 0.5, maxDocFreq: Int = 1000,
      maxBucketSize: Int = 1000): DataFrame = {
    // ONE shingle pass: set sizes come from a count over the exploded rows
    // rather than a second evaluation of the (expensive) shingle expression
    val pairsAll = df.select(col(idCol).as("id"),
      explode(shingleHashExpr(col(textCol), n)).as("sh"))
    val sizes = pairsAll.groupBy("id").agg(count(lit(1)).as("n_sh"))
    val hot = pairsAll.groupBy("sh").agg(count(lit(1)).as("df_"))
      .filter(col("df_") > maxDocFreq).select("sh")
    val filtered = pairsAll.join(hot, Seq("sh"), "left_anti")

    // prefix index: rarest-first is the classic heuristic; hash order is an
    // equally valid total order and needs no document-frequency join
    // (shingles are already 64-bit hashes — order by value)
    val byDoc = Window.partitionBy("id").orderBy(col("sh"))
    val withPos = filtered
      .withColumn("pos", row_number().over(byDoc))
      .withColumn("n_filt", count(lit(1)).over(Window.partitionBy("id")))
    val prefix = withPos
      .filter(col("pos") <= floor((lit(1.0) - threshold) * col("n_filt")) + 1)
      .select("id", "sh")
    // cap pathological prefix buckets (skew guard, same as the LSH paths)
    val small = prefix.groupBy("sh").agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") <= maxBucketSize).select("sh")
    val prefixOk = prefix.join(small, Seq("sh"))
    val cand = prefixOk.select(col("sh"), col("id").as("id_a"))
      .join(prefixOk.select(col("sh"), col("id").as("id_b")), Seq("sh"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()

    // verify candidates: full (hot-filtered) intersection counts
    val inter = cand
      .join(filtered.select(col("id").as("id_a"), col("sh")), Seq("id_a"))
      .join(filtered.select(col("id").as("id_b"), col("sh")), Seq("id_b", "sh"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "sz_a"), Seq("id_a"))
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "sz_b"), Seq("id_b"))
      .withColumn("jaccard",
        col("n_inter").cast("double") / (col("sz_a") + col("sz_b") - col("n_inter")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** MinHash signatures: one row per doc, `numHashes` signature columns
    * computed as k min-aggregates over ONE pass of exploded shingles.
    * The k hash functions are xxhash64 seeded with (seed, i) — no affine
    * arithmetic, so no ANSI-mode overflow and full 64-bit mixing.
    */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 64, seed: Long = 42L): DataFrame = {
    // shingles arrive as 64-bit hashes (no string materialization); the k
    // minhash functions are cheap long-mixes of that base hash
    val base = df.select(col(idCol).as("id"),
      explode(shingleHashExpr(col(textCol), shingleN)).as("h"))
    val sigs = (0 until numHashes).map { i =>
      min(xxhash64(lit(seed), lit(i), col("h"))).as(s"sig_$i")
    }
    base.groupBy("id").agg(sigs.head, sigs.tail: _*)
  }

  /** LSH candidate pairs from MinHash signatures: `bands` bands of
    * `numHashes / bands` rows; docs sharing any band bucket are candidates.
    * Returns (id_a, id_b, n_bands_shared), id_a < id_b.
    */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 64, bands: Int = 16,
      seed: Long = 42L, maxBucketSize: Int = 200): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val sig = minhashSignatures(df, idCol, textCol, shingleN, numHashes, seed)
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64((b * rows until (b + 1) * rows).map(i => col(s"sig_$i")): _*).as("bkey"))
    }
    val buckets = sig.select(col("id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("id"), col("bk.band"), col("bk.bkey"))
    // cap pathological buckets before the self-join
    val small = buckets.groupBy("band", "bkey").agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") <= maxBucketSize).select("band", "bkey")
    val pruned = buckets.join(small, Seq("band", "bkey"))
    val l = pruned.select(col("band"), col("bkey"), col("id").as("id_a"))
    val r = pruned.select(col("band"), col("bkey"), col("id").as("id_b"))
    l.join(r, Seq("band", "bkey")).filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_bands_shared"))
  }

  /** 64-bit SimHash per document: per-feature hash bits vote ±1, the sign
    * of each bit-sum is the signature bit. One explode + one aggregation.
    * `shingleN` > 1 uses word n-gram features instead of unigrams — far
    * more discriminative on template-heavy corpora (unigram SimHash calls
    * any two documents sharing vocabulary near-duplicates).
    */
  def simhash(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3): DataFrame = {
    val tok =
      if (shingleN <= 1)
        df.select(col(idCol).as("id"), explode(split(col(textCol), "\\s+")).as("t"))
          .select(col("id"), xxhash64(col("t")).as("h"))
      else
        df.select(col(idCol).as("id"),
          explode(shingleHashExpr(col(textCol), shingleN)).as("h"))
    val votes = (0 until 64).map { b =>
      sum(when(getbit(col("h"), lit(b)) === 1, 1).otherwise(-1)).as(s"v_$b")
    }
    tok.groupBy("id").agg(votes.head, votes.tail: _*)
      .select(col("id"),
        (0 until 64).map(b =>
          when(col(s"v_$b") > 0, shiftleft(lit(1L), b)).otherwise(0L))
          .reduce(_ bitwiseOR _).as("simhash"))
  }

  /** Near-duplicate pairs with hamming(simhash) ≤ `maxHamming`, via the
    * pigeonhole block trick (t+1 equi-joins, no cross join).
    * Returns (id_a, id_b, hamming), id_a < id_b.
    */
  /** Note on `maxHamming`: block width is 64/(t+1) bits, so high thresholds
    * mean narrow blocks, tiny bucket keyspaces, and quadratic bucket
    * blow-up (t=16 → 3-bit blocks → 8 buckets per block). Keep t ≤ 8 and
    * let `maxBucketSize` cap pathological buckets, same as MinHash LSH.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 8, maxBucketSize: Int = 500,
      shingleN: Int = 3): DataFrame = {
    val nBlocks = maxHamming + 1
    val width = 64 / nBlocks
    val sh = simhash(df, idCol, textCol, shingleN)
    val blockCols = (0 until nBlocks).map { b =>
      struct(lit(b).as("blk"),
        shiftright(col("simhash"), b * width)
          .bitwiseAND(lit((1L << width) - 1)).as("bval"))
    }
    val blocks = sh.select(col("id"), col("simhash"), explode(array(blockCols: _*)).as("bk"))
      .select(col("id"), col("simhash"), col("bk.blk"), col("bk.bval"))
    val small = blocks.groupBy("blk", "bval").agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") <= maxBucketSize).select("blk", "bval")
    val pruned = blocks.join(small, Seq("blk", "bval"))
    val l = pruned.select(col("blk"), col("bval"), col("id").as("id_a"), col("simhash").as("sh_a"))
    val r = pruned.select(col("blk"), col("bval"), col("id").as("id_b"), col("simhash").as("sh_b"))
    l.join(r, Seq("blk", "bval")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
