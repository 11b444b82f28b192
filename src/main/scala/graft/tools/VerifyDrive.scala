package graft.tools

// Temporary verification driver: exercises the public graft.glm API
// end-to-end on real parquet, the way a library user would.
import graft.glm._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object VerifyDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"

    println("=== 1. LM via formula with categorical dummies (customer) ===")
    val cust = spark.read.parquet(s"$dir/customer.parquet")
    val lm = LM.fitFormula(cust, "c_acctbal ~ c_nationkey + c_mktsegment")
    println(lm.summary)

    println("=== 2. LM fit + score pipeline (lineitem) ===")
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val lm2 = LM.fit(li, Seq("l_quantity", "l_discount", "l_tax"), "l_extendedprice")
    println(lm2.summary)
    val scored = lm2.predict(li)
    scored.select("l_quantity", "l_extendedprice", "prediction").show(5)

    println("=== 3. score with a missing column (matchCols path) ===")
    lm2.predict(li.drop("l_tax")).select("l_quantity", "prediction").show(3)

    println("=== 4. GLM binomial logit (lineitem: is return flag R?) ===")
    val li2 = li.withColumn("is_r", when(col("l_returnflag") === "R", 1.0).otherwise(0.0))
    val glm = GLM.fit(li2, Seq("l_quantity", "l_discount"), "is_r", verbose = true)
    println(glm.summary)
    glm.predict(li2).select("l_quantity", "is_r", "prediction").show(5)

    println("=== 5. GLM probit on the same data ===")
    val glmP = GLM.fit(li2, Seq("l_quantity", "l_discount"), "is_r", linkName = "probit")
    println(s"probit coefs: ${glmP.coefs}  iter=${glmP.iter} dev=${glmP.deviance}")

    println("=== 6. probe: all-constant y (degenerate GLM) ===")
    try {
      val g = GLM.fit(li2.withColumn("zero", lit(0.0)), Seq("l_quantity"), "zero")
      println(s"degenerate fit: coefs=${g.coefs} iter=${g.iter} dev=${g.deviance}")
    } catch { case e: Exception => println(s"degenerate fit threw: ${e.getMessage}") }

    println("=== 7. probe: p > n (more params than rows) ===")
    try {
      LM.fit(li.limit(2), Seq("l_quantity", "l_discount", "l_tax"), "l_extendedprice")
      println("p>n: no error (unexpected)")
    } catch { case e: Exception => println(s"p>n threw: ${e.getMessage}") }

    println("=== 8. probe: non-numeric feature column ===")
    try {
      val m = LM.fit(li, Seq("l_returnflag"), "l_extendedprice")
      println(s"string feature: coefs=${m.coefs} (cast produced nulls?)")
    } catch { case e: Exception => println(s"string feature threw: ${e.getClass.getSimpleName}: ${e.getMessage}") }

    spark.stop()
  }
}
