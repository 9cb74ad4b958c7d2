package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-trained text classification — the shape of the fastText-style
  * quality/domain classifiers training pipelines run over every document
  * (CCNet, Gopher, LLaMA data prep). Multinomial Naive Bayes with
  * Laplace smoothing: deterministic (no RNG, no SGD order-dependence),
  * closed-form trainable in two aggregate passes, and therefore
  * oracle-checkable in plain SQL — unlike a learned-embedding classifier,
  * which this slots in for architecturally (same broadcast-model,
  * one-scan-score plan).
  *
  * Scale shape: the trained model is (vocab × classes) smoothed
  * log-probabilities — a broadcastable artifact (cap the vocab by
  * document frequency at 100 TB, exactly like the TF-IDF/BM25 df tables).
  * Scoring is one corpus scan: explode tokens, hash-join the broadcast
  * model, re-aggregate per (doc, class), argmax. No corpus self-join,
  * no iteration.
  */
object Classify {

  /** Train on the labeled frame and classify every row of it (in-corpus
    * fit — the standard curation setup where a seed-labeled corpus scores
    * itself; score a different frame by unioning it in with null labels
    * upstream). Scores round to 6 dp BEFORE the argmax so ranking is
    * stable across engines; ties break to the lexicographically smallest
    * label. Output: (id, label, pred, score). */
  def nbClassify(df: DataFrame, idCol: String, textCol: String,
      labelCol: String): DataFrame = {
    val dw = df.select(col(idCol), col(labelCol).as("label"),
      explode(split(col(textCol), " ")).as("word"))
    // model: per-(class, word) occurrence counts + per-class totals,
    // priors, and vocabulary size — two map-side-combinable aggregates.
    // wc IS the broadcastable model artifact (vocab × classes), so it is
    // pinned (Dedup's registry) and every model-derived table reads the
    // cache: ct, and voc — distinct words over wc ≡ distinct words over
    // dw, but costs a cache scan instead of a third TEXT pass. Text is
    // read exactly twice (model build + scoring grid); the unpinned form
    // read it four times (Plans --executed census: 8 scans → 4).
    val wc = Dedup.pin(
      dw.groupBy(col("label"), col("word")).agg(count(lit(1)).as("cnt")))
    val ct = wc.groupBy(col("label")).agg(sum(col("cnt")).as("toks"))
    val pri = df.groupBy(col(labelCol).as("label")).agg(count(lit(1)).as("ndocs"))
    val nd = df.agg(count(lit(1)).as("nd"))
    val voc = wc.select(col("word")).distinct().agg(count(lit(1)).as("v"))
    // score: every token occurrence × every class, smoothed class-
    // conditional log-likelihood; the model rides broadcast joins.
    val grid = dw.select(col(idCol), col("word"))
      .crossJoin(broadcast(pri.select(col("label"))))
    val contrib = grid
      .join(broadcast(wc), Seq("label", "word"), "left")
      .join(broadcast(ct), Seq("label"))
      .crossJoin(broadcast(voc))
      .select(col(idCol), col("label"),
        log((coalesce(col("cnt"), lit(0L)) + lit(1.0d)) /
          (col("toks") + col("v"))).as("ll"))
    val scores = contrib.groupBy(col(idCol), col("label")).agg(sum(col("ll")).as("sll"))
    // argmax as a declarative aggregate, not a window: min_by over
    // (-score asc, label asc) = (score desc, label asc), the same
    // deterministic tie-break the former row_number window used — but
    // with map-side partial merge, so the exchange carries one partial
    // winner per (doc, input partition) instead of every (doc, label)
    // row, and no per-doc sort runs. Scores are finite log sums (no
    // NaN), so the negation is order-exact.
    val pred = scores
      .join(broadcast(pri), Seq("label"))
      .crossJoin(broadcast(nd))
      .select(col(idCol),
        col("label"),
        round(col("sll") + log(col("ndocs").cast("double") / col("nd")), 6).as("score"))
      .groupBy(col(idCol))
      .agg(min_by(struct(col("label"), col("score")),
        struct(negate(col("score")), col("label"))).as("best"))
      .select(col(idCol), col("best.label").as("pred"), col("best.score").as("score"))
    df.select(col(idCol), col(labelCol)).join(pred, Seq(idCol))
  }
}
