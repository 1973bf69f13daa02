package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.model.{Proposition, PropositionScore}

/** The facts model: proposers emit uncertain `Proposition`s, evaluators
  * reconcile conflicting producers (reference:
  * model/src/main/kotlin/facts/facts.kt:6-36 and README "Use case 1 …
  * give each producer a weight"). The reference designed this surface but
  * only wired MaxScore (facts/implementations.kt:6-14); here both row
  * (Scala) and columnar (aggregate over grouped propositions) forms
  * exist, and weighted voting generalizes MaxScore.
  */
object Facts {

  trait Evaluator extends Serializable {
    def name: String
    def evaluate(props: Seq[Proposition]): PropositionScore
  }

  /** Pick the max-confidence proposal, score 1.0 —
    * reference: facts/implementations.kt:6-14. Ties break on
    * (confidence, proposal, proposer) to stay deterministic. */
  object MaxScore extends Evaluator {
    override def name: String = "max"
    override def evaluate(props: Seq[Proposition]): PropositionScore =
      if (props.isEmpty) PropositionScore(null, 0.0)
      else {
        val best = props.maxBy(p => (p.confidence, p.proposal, p.proposer))
        PropositionScore(best.proposal, 1.0)
      }
  }

  /** `NoScore` — reference: facts/implementations.kt:19-23. */
  object NoScore extends Evaluator {
    override def name: String = "none"
    override def evaluate(props: Seq[Proposition]): PropositionScore =
      PropositionScore(null, 0.0)
  }

  /** Weighted vote: per-producer weights, proposal with the largest weighted
    * confidence mass wins; score = winning mass / total mass. The
    * generalization the reference README sketches but never implements. */
  class WeightedVote(weights: Map[String, Double], default: Double = 1.0) extends Evaluator {
    override def name: String = "weighted"
    override def evaluate(props: Seq[Proposition]): PropositionScore =
      if (props.isEmpty) PropositionScore(null, 0.0)
      else {
        val mass = props.groupBy(_.proposal).view.mapValues(
          _.map(p => p.confidence * weights.getOrElse(p.proposer, default)).sum).toMap
        val total = mass.values.sum
        val (proposal, m) = mass.maxBy { case (prop, m) => (m, prop) }
        PropositionScore(proposal, if (total == 0) 0.0 else m / total)
      }
  }

  /** Columnar MaxScore over a propositions frame
    * (subject, proposal, confidence, proposer): one commutative argmax
    * aggregate per subject — partial-aggregation friendly at any scale
    * (native ArgMaxByOrd: the struct-keyed max_by would fall back to
    * SortAggregate; see NativeExpressions). */
  def evaluateMax(props: DataFrame): DataFrame =
    props.groupBy(col("subject"))
      .agg(graft.functions.NativeExpressions.argMaxBy(col("proposal"),
        col("confidence"), col("proposal"), col("proposer")).as("proposal"),
        lit(1.0).as("score"))

  /** Typed evaluation per subject with a pluggable evaluator. */
  def evaluate(props: Dataset[Proposition], evaluator: Evaluator): DataFrame = {
    val spark = props.sparkSession
    import spark.implicits._
    props.groupByKey(_.subject)
      .mapGroups { (subject, it) =>
        val s = evaluator.evaluate(it.toSeq)
        (subject, s.proposal, s.score)
      }
      .toDF("subject", "proposal", "score")
  }
}
