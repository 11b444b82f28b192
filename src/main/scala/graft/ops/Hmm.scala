package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hidden-Markov Viterbi decoding over per-key ordered event streams —
  * the sequence-LABELING member of the event-analytics family (funnels
  * check one pattern, [[SeqMine]] discovers patterns, [[EventSeq]]'s
  * Markov chain scores transitions; this assigns each key its most
  * likely HIDDEN state path under a given model). The model (initial /
  * transition / emission log-probabilities) rides as plan literals in
  * integer MICRO-NATS — the q305 Viterbi discipline — so the DP is
  * exact integer arithmetic end to end and replays bit-for-bit.
  *
  * Execution: the frontier is ONE ROW PER KEY holding the k per-state
  * best scores and paths as named columns (k is model-sized). Step t =
  * one left join against the position-t observation slice + a pure
  * projection computing all k² candidate transitions with
  * first-max-wins argmax (ties break toward the lower state index, the
  * q305 convention); keys whose stream is shorter than t pass through
  * unchanged. maxSteps bounds the loop and the per-key state, loudly.
  *
  * Scale shape: per step ONE keyed equi-join + projection over the
  * key-sized frontier; no per-path explosion (Viterbi keeps exactly k
  * rows of state per key, folded into one).
  */
object Hmm {

  /** @param states      hidden state names, index order = tie order
    * @param initMicro   per state: initial log-prob, micro-nats
    * @param transMicro  (from, to) log-prob, micro-nats; missing pairs
    *                    are forbidden transitions (−10¹² micro-nats)
    * @param emitMicro   (state, observation) log-prob, micro-nats
    * @param unkEmitMicro emission score for observations absent from
    *                    `emitMicro` under the state
    * @param maxSteps    decode at most this many leading events per key
    * @return (keyCol, n_steps, path, score_micro) — path = ">"-joined
    *         state names of the best path, exact integer score
    */
  def viterbiDecode(df: DataFrame, keyCol: String, orderCols: Seq[String],
      obsCol: String, states: Seq[String],
      initMicro: Map[String, Long],
      transMicro: Map[(String, String), Long],
      emitMicro: Map[(String, String), Long],
      unkEmitMicro: Long, maxSteps: Int): DataFrame = {
    require(states.nonEmpty && states.size <= 8,
      s"need 1..8 states, got ${states.size}")
    require(states.forall(initMicro.contains), "initMicro must cover states")
    require(maxSteps >= 1 && maxSteps <= 16,
      s"need 1 <= maxSteps <= 16, got $maxSteps")
    val forbidden = -1000000000000L
    val k = states.size
    def trans(i: Int, j: Int): Long =
      transMicro.getOrElse((states(i), states(j)), forbidden)
    def emit(j: Int, obs: Column): Column = {
      val pairs = emitMicro.collect {
        case ((s, o), v) if s == states(j) => (o, v)
      }.toSeq.sortBy(_._1)
      pairs.foldRight(lit(unkEmitMicro): Column) { case ((o, v), acc) =>
        when(obs === o, lit(v)).otherwise(acc)
      }
    }
    val w = Window.partitionBy(keyCol).orderBy(orderCols.map(col): _*)
    val ev = df.filter(col(obsCol).isNotNull)
      .withColumn("__pos", row_number().over(w))
      .filter(col("__pos") <= maxSteps)
      .select(col(keyCol).as("__k"), col(obsCol).as("__o"), col("__pos"))
    // early exit on the TRUE max stream length: one cheap scalar agg so
    // the step loop (one keyed join per step) never builds join stages
    // past the longest observed stream — maxSteps stays the loud upper
    // bound, the data decides the actual round count
    val tMax = {
      val r = ev.agg(max("__pos")).head()
      if (r.isNullAt(0)) 1 else math.min(maxSteps, r.getInt(0))
    }
    def slice(t: Int) = ev.filter(col("__pos") === t)
      .select(col("__k"), col("__o"))
    var frontier = slice(1).select(
      col("__k") +:
        (0 until k).flatMap { j =>
          Seq((lit(initMicro(states(j))) + emit(j, col("__o")))
            .as(s"__s$j"), lit(states(j)).as(s"__p$j"))
        }: _*)
    for (t <- 2 to tMax) {
      val joined = frontier.join(slice(t), Seq("__k"), "left")
      frontier = joined.select(
        col("__k") +:
          (0 until k).flatMap { j =>
            // candidate i→j scores; first-max-wins over i ascending
            val cands = (0 until k).map(i => col(s"__s$i") + lit(trans(i, j)))
            val best = cands.reduceLeft((a, b) => greatest(a, b))
            val arg = (0 until k).foldRight(lit(k - 1): Column) {
              case (i, acc) =>
                if (i == k - 1) acc
                else when(cands(i) >= best, lit(i)).otherwise(acc)
            }
            val newScore = best + emit(j, col("__o"))
            val newPath = concat(
              (0 until k).foldRight(col(s"__p${k - 1}")) { case (i, acc) =>
                if (i == k - 1) acc
                else when(arg === i, col(s"__p$i")).otherwise(acc)
              }, lit(">"), lit(states(j)))
            Seq(when(col("__o").isNull, col(s"__s$j")).otherwise(newScore)
              .as(s"__s$j"),
              when(col("__o").isNull, col(s"__p$j")).otherwise(newPath)
                .as(s"__p$j"))
          }: _*)
    }
    val scores = (0 until k).map(j => col(s"__s$j"))
    val bestScore = scores.reduceLeft((a, b) => greatest(a, b))
    val bestPath = (0 until k).foldRight(col(s"__p${k - 1}")) {
      case (j, acc) =>
        if (j == k - 1) acc
        else when(col(s"__s$j") >= bestScore, col(s"__p$j")).otherwise(acc)
    }
    frontier.select(col("__k").as(keyCol),
      size(split(bestPath, ">")).as("n_steps"),
      bestPath.as("path"), bestScore.as("score_micro"))
  }
}
