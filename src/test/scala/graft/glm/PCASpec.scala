package graft.glm

import breeze.linalg.{DenseMatrix => BDM, DenseVector => BDV}
import graft.SparkSpec
import org.apache.spark.sql.functions._

class PCASpec extends SparkSpec {
  import spark.implicits._

  private lazy val data = {
    val rng = new scala.util.Random(41)
    (1 to 400).map { _ =>
      val t = rng.nextGaussian()
      // strong shared factor + independent noise: a known dominant PC
      (t * 3.0 + rng.nextGaussian() * 0.3,
        t * 2.0 + rng.nextGaussian() * 0.3,
        rng.nextGaussian() * 0.5)
    }.toDF("x1", "x2", "x3")
  }

  test("eigenpairs satisfy cov·v = λ·v against a local covariance") {
    val m = PCA.fit(data, Seq("x1", "x2", "x3"))
    val rows = data.collect().map(r => Array(r.getDouble(0), r.getDouble(1), r.getDouble(2)))
    val n = rows.length
    val mean = Array.tabulate(3)(j => rows.map(_(j)).sum / n)
    val cov = BDM.tabulate(3, 3) { (i, j) =>
      rows.map(r => (r(i) - mean(i)) * (r(j) - mean(j))).sum / (n - 1.0)
    }
    (0 until 3).foreach(j => assert(math.abs(m.mean(j) - mean(j)) < 1e-10))
    // descending eigenvalues, each eigenpair satisfied
    assert(m.eigenvalues(0) >= m.eigenvalues(1) && m.eigenvalues(1) >= m.eigenvalues(2))
    (0 until 3).foreach { k =>
      val v = BDV.tabulate(3)(j => m.components(j, k))
      val av = cov * v
      (0 until 3).foreach(j =>
        assert(math.abs(av(j) - m.eigenvalues(k) * v(j)) < 1e-8,
          s"PC$k row $j: ${av(j)} vs ${m.eigenvalues(k) * v(j)}"))
      assert(math.abs(breeze.linalg.norm(v) - 1.0) < 1e-10) // unit vectors
    }
    // the planted shared factor dominates
    assert(m.varianceExplained(1) > 0.9)
  }

  test("transform projections have variance = eigenvalue and zero cross-correlation") {
    val m = PCA.fit(data, Seq("x1", "x2", "x3"))
    val proj = m.transform(data, 2)
      .agg(var_samp($"pc1"), var_samp($"pc2"), covar_samp($"pc1", $"pc2"),
        avg($"pc1"), avg($"pc2")).head()
    assert(math.abs(proj.getDouble(0) - m.eigenvalues(0)) < 1e-8 * (1 + m.eigenvalues(0)))
    assert(math.abs(proj.getDouble(1) - m.eigenvalues(1)) < 1e-8 * (1 + m.eigenvalues(1)))
    assert(math.abs(proj.getDouble(2)) < 1e-8) // PCs uncorrelated
    assert(math.abs(proj.getDouble(3)) < 1e-8 && math.abs(proj.getDouble(4)) < 1e-8)
  }

  test("fitVector on the real 64-dim embedding column (wide treeAggregate Gram path)") {
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val m = PCA.fitVector(embs, "embedding", dim = 64)
    assert(m.p === 64)
    assert(m.eigenvalues(0) > 0 && m.eigenvalues(0) >= m.eigenvalues(63))
    // total variance equals the sum of per-element variances (trace identity)
    val perElem = (1 to 64).map(i =>
      var_samp(element_at($"embedding", i).cast("double")))
    val trace = embs.agg(perElem.head, perElem.tail: _*).head()
      .toSeq.map(_.asInstanceOf[Double]).sum
    val evSum = breeze.linalg.sum(m.eigenvalues)
    assert(math.abs(evSum - trace) < 1e-6 * (1 + trace), s"$evSum vs $trace")
    // projections stay distributed: transform is a pure column expression
    val t2 = m.transform(embs, 2)
    assert(t2.columns.contains("pc1") && t2.columns.contains("pc2"))
    assert(t2.count() === embs.count())
  }
}
