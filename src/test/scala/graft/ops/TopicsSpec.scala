package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TopicsSpec extends SparkSpec {
  import spark.implicits._

  private def md5ModK(s: String, k: Int): Int = {
    val h = java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils.md5Hex(s)
        .substring(0, 15), 16)
    (h % k).toInt
  }

  test("one EM round matches an independent driver-side replay") {
    // corpus: doc 1 = "a a b", doc 2 = "b"; k = 2, all words in vocab
    val df = Seq((1L, "a a b"), (2L, "b")).toDF("doc_id", "text")
    val m = Topics.fitPlsa(df, "doc_id", "text", k = 2, topV = 5,
      iters = 1)

    // independent replay in plain scala (same pinned arithmetic)
    val vocab = Seq("a", "b") // both count 2, (count desc, word) order
    val counts = Map((1L, "a") -> 2L, (1L, "b") -> 1L, (2L, "b") -> 1L)
    val phi0: Map[(Int, String), Long] =
      (for (z <- 0 until 2; w <- vocab)
        yield (z, w) -> (if (md5ModK(w, 2) == z) 2L else 1L)).toMap
    val phiTot = (0 until 2).map(z => vocab.map(w => phi0((z, w))).sum)
    def phi(z: Int, w: String): Double =
      phi0((z, w)).toDouble / phiTot(z).toDouble
    def theta0(d: Long): Array[Long] = {
      val hot = md5ModK(d.toString, 2)
      Array.tabulate(2)(z => if (z == hot) 2000000L else 1000000L)
    }
    val cells = counts.toSeq.map { case ((d, w), n) =>
      val t = theta0(d)
      val tot = t(0).toDouble + t(1).toDouble
      val num = Array.tabulate(2)(z => (t(z).toDouble / tot) * phi(z, w))
      val den = num(0) + num(1)
      (d, w, Array.tabulate(2)(z =>
        math.round(n.toDouble * (num(z) / den) * 1e6)))
    }
    val expTheta = cells.groupBy(_._1).view.mapValues { cs =>
      Array.tabulate(2)(z => math.max(cs.map(_._3(z)).sum, 1L))
    }.toMap
    val expPhi = (for (z <- 0 until 2; w <- vocab) yield (z, w) ->
      math.max(cells.filter(_._2 == w).map(_._3(z)).sum, 1L)).toMap

    val gotTheta = m.docTopics.collect()
      .map(r => r.getLong(0) -> Array(r.getLong(1), r.getLong(2))).toMap
    assert(gotTheta.keySet === Set(1L, 2L))
    for (d <- Seq(1L, 2L); z <- 0 until 2)
      assert(gotTheta(d)(z) === expTheta(d)(z), s"theta d=$d z=$z")
    val gotPhi = m.topicWord.map { case (z, w, c) => (z, w) -> c }.toMap
    assert(gotPhi === expPhi)
  }

  test("topics separate disjoint co-occurrence groups") {
    val rows = (1L to 40L).map { i =>
      (i, if (i % 2 == 0) "xx yy xx yy xx" else "pp qq pp qq pp")
    }
    val m = Topics.fitPlsa(rows.toDF("doc_id", "text"), "doc_id", "text",
      k = 2, topV = 10, iters = 6)
    val p = m.topicWordDF(spark).collect()
      .map(r => (r.getInt(0), r.getString(1)) -> r.getDouble(3)).toMap
    // each topic concentrates on one group
    val g0 = (0 until 2).map(z => p((z, "xx")) + p((z, "yy")))
    assert(g0.max > 0.9, s"no xx/yy topic: $g0")
    assert(g0.min < 0.1, s"no pp/qq topic: $g0")
    // and docs load on their group's topic
    val dt = m.docTopicsDF.collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(3)).toMap
    val zX = g0.indexOf(g0.max)
    assert(dt((2L, zX)) > 0.9)   // even doc: xx yy
    assert(dt((1L, zX)) < 0.1)   // odd doc: pp qq
  }

  test("probabilities sum to 1 within each topic and each doc") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val m = Topics.fitPlsa(docs, "doc_id", "text", k = 3, topV = 20,
      iters = 2)
    val byTopic = m.topicWordDF(spark).groupBy("topic")
      .agg(sum("p").as("s")).collect().map(_.getDouble(1))
    assert(byTopic.forall(s => math.abs(s - 1.0) < 1e-9))
    val byDoc = m.docTopicsDF.groupBy(m.idCol).agg(sum("p").as("s"))
      .collect().map(_.getDouble(1))
    assert(byDoc.forall(s => math.abs(s - 1.0) < 1e-9))
  }

  test("fit is partition-invariant (content-keyed init, integer cells)") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val a = Topics.fitPlsa(docs, "doc_id", "text", k = 3, topV = 15,
      iters = 2)
    val b = Topics.fitPlsa(docs.repartition(7), "doc_id", "text", k = 3,
      topV = 15, iters = 2)
    assert(a.topicWord.sortBy(t => (t._1, t._2)) ===
      b.topicWord.sortBy(t => (t._1, t._2)))
    val at = a.docTopics.orderBy("doc_id").collect().map(_.toSeq)
    val bt = b.docTopics.orderBy("doc_id").collect().map(_.toSeq)
    assert(at.toSeq === bt.toSeq)
  }

  test("empty corpus rejects loudly") {
    intercept[IllegalArgumentException] {
      Topics.fitPlsa(Seq((1L, "   ")).toDF("doc_id", "text"),
        "doc_id", "text", k = 2, topV = 5)
    }
  }
}
