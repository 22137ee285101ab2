package graft.ext

import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.feature.HashingTF
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based document quality scoring — the classifier-filter stage of
  * web-corpus curation (the GPT-3/LLaMA-style "does this look like a
  * reference page?" gate; reference pipelines score with a fastText-like
  * linear model and keep by threshold or noisy-threshold sampling). Two
  * halves, both linear models over term counts:
  *
  *  - [[train]] / [[score]]: a real spark.ml pipeline — whitespace tokens
  *    → [[HashingTF]] (sparse term-frequency vector, feature hashing, no
  *    vocabulary state) → binomial [[LogisticRegression]]. Training is a
  *    handful of corpus passes over the label set (usually a SMALL seed:
  *    positives = curated exemplars, negatives = random crawl); scoring
  *    is one map-only model.transform pass — no shuffle, model weights
  *    ship as a broadcast task binary.
  *  - [[markerLogit]]: the engine-portable closed form σ(b + Σ w_t·tf_t)
  *    over NAMED marker terms with literal weights — the shape a fitted
  *    linear model reduces to after vocabulary projection, expressible
  *    identically in SQL for the oracle gate (and handy by itself as an
  *    interpretable hand-tuned gate).
  */
object QualityClassifier {

  /** Fitted classifier: the hashing transformer + the logistic model. */
  final case class TextClassifier(
      hasher: HashingTF, model: LogisticRegressionModel) {
    def numFeatures: Int = hasher.getNumFeatures
  }

  /** Train a binomial logistic quality classifier on a labeled frame.
    *
    * @param labeled  frame with `textCol` (string) and `labelCol`
    *                 (0.0/1.0 double; 1 = keep-quality)
    * @param numFeatures hashed feature space (power of two; 2^18 default
    *                 — fastText-scale, KBs of dense weights)
    */
  def train(
      labeled: DataFrame, textCol: String, labelCol: String,
      numFeatures: Int = 1 << 18, maxIter: Int = 50,
      regParam: Double = 1e-4): TextClassifier = {
    require(numFeatures > 0, s"numFeatures must be positive: $numFeatures")
    val hasher = new HashingTF()
      .setInputCol("__toks").setOutputCol("__features")
      .setNumFeatures(numFeatures)
    val prepared = hasher.transform(
      labeled.withColumn("__toks",
        filter(TextAnalysis.tokens(col(textCol)), t => length(t) > 0)))
    val lr = new LogisticRegression()
      .setFeaturesCol("__features").setLabelCol(labelCol)
      .setMaxIter(maxIter).setRegParam(regParam)
    TextClassifier(hasher, lr.fit(prepared))
  }

  /** Score a corpus under a fitted classifier: appends `quality_prob`
    * (P(label=1)). One hashing + one dense-dot map pass, zero shuffle at
    * any corpus size; the weight vector broadcasts with the task. */
  def score(
      df: DataFrame, textCol: String, clf: TextClassifier): DataFrame = {
    // MLlib transform appends rawPrediction/prediction columns we discard
    // below; refuse inputs that already carry same-named columns rather
    // than silently dropping the caller's data (advisor round-8)
    val reserved = Seq("__toks", "__features", "__prob",
      "rawPrediction", "prediction")
    val clash = df.columns.toSet.intersect(reserved.toSet)
    require(clash.isEmpty,
      s"score() uses internal column name(s) ${clash.mkString(", ")} that " +
        "already exist on the input — rename or drop them first")
    val hashed = clf.hasher.transform(
      df.withColumn("__toks",
        filter(TextAnalysis.tokens(col(textCol)), t => length(t) > 0)))
    // copy() — setFeaturesCol/setProbabilityCol on the shared model would
    // mutate the caller's classifier in place (advisor round-8)
    clf.model.copy(new org.apache.spark.ml.param.ParamMap()
        .put(clf.model.featuresCol, "__features")
        .put(clf.model.probabilityCol, "__prob"))
      .transform(hashed)
      // vector_to_array + element_at stay inside codegen — a closure UDF
      // here would box every row on the per-document scoring hot path
      .withColumn("quality_prob", element_at(
        org.apache.spark.ml.functions.vector_to_array(col("__prob")), 2))
      .drop("__toks", "__features", "__prob", "rawPrediction", "prediction")
  }

  /** GPT-3-style noisy-threshold sampling (Brown et al. 2020, App. A):
    * keep a document iff `pareto_draw > 1 − score`, so high-scoring docs
    * almost always survive while low scorers keep a heavy-tailed chance —
    * the standard softening that stops a classifier gate from collapsing
    * corpus diversity. DETERMINISTIC twin of the paper's
    * `np.random.pareto(α)`: the draw is `(1−u)^(−1/α) − 1` (inverse-CDF
    * of the Lomax/Pareto-II tail) with `u` the first 52 bits of
    * `md5(id:seed)` scaled to [0, 1) — reproducible across runs, engines
    * and cluster layouts, reseedable per epoch, map-only (one hash per
    * row, no shuffle). The comparison uses 6-dp-rounded operands on both
    * sides so cross-engine `pow` ulps cannot flip a keep decision.
    * Appends `pareto_draw` and keeps surviving rows. */
  def noisyThresholdGate(
      df: DataFrame, idCol: String, scoreCol: String,
      alpha: Double = 9.0, seed: String = "42"): DataFrame = {
    require(alpha > 0, s"alpha must be positive, got $alpha")
    val pri = graft.ops.Sampling.hashPriority(col(idCol), seed)
    val u = graft.ops.Sampling.priorityPrefix(pri, 13).cast("double") /
      lit(4503599627370496.0) // 2^52: 13 hex digits, exact in double
    val draw = pow(lit(1.0) - u, lit(-1.0 / alpha)) - lit(1.0)
    df.withColumn("pareto_draw", round(draw, 6))
      .filter(col("pareto_draw") > round(lit(1.0) - col(scoreCol), 6))
  }

  /** Engine-portable linear gate: appends `logit` = b + Σ w_t·tf_t over
    * the marker terms and `prob` = σ(logit), both rounded to `roundTo` dp
    * (per-term products sum in deterministic declared weight order — the
    * weights frame is a literal — so both engines agree). Map-only: ONE
    * [[graft.functions.VocabTfs]] kernel eval per row — a single UTF-8
    * byte pass counts every marker term's tf at once (the previous
    * per-term [[graft.functions.CountInSet]] form re-split the text into
    * a token array once per term — 4 markers = 4 tokenizations; value-
    * identical, QualityClassifierSpec pins the closed form). No explode,
    * no join, no shuffle. Marker sets are interpretable and small by
    * design (a distilled linear model's top terms); for opaque hashed
    * models use [[score]].
    */
  def markerLogit(
      df: DataFrame, textCol: String, weights: Seq[(String, Double)],
      bias: Double, roundTo: Int = 6): DataFrame = {
    require(weights.nonEmpty, "weights must be non-empty")
    require(weights.map(_._1).distinct.size == weights.size,
      "duplicate marker term in weights")
    require(!df.columns.contains("__tfs"),
      "input column '__tfs' collides with markerLogit internals")
    import org.apache.spark.sql.GraftColumnBridge
    // the kernel lands in its OWN projection: its array is consumed once
    // per term, and CollapseProject never inlines a non-cheap expression
    // into multiple consumers, so exactly one kernel eval per row
    // survives optimization
    val tfs = GraftColumnBridge.column(graft.functions.VocabTfs(
      GraftColumnBridge.expression(col(textCol)),
      weights.map(_._1))).getField("tfs")
    // deterministic left-to-right sum in declared weight order; integer
    // tf × dyadic weight keeps every term exact in double
    val logit = weights.zipWithIndex.foldLeft(lit(bias)) {
      case (acc, ((_, w), i)) =>
        acc + lit(w) * element_at(col("__tfs"), i + 1).cast("double")
    }
    df.withColumn("__tfs", tfs)
      .withColumn("logit", round(logit, roundTo))
      .withColumn("prob",
        round(lit(1.0) / (lit(1.0) + exp(-col("logit"))), roundTo))
      .drop("__tfs")
  }
}
