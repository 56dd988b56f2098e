package graft.ml

import org.apache.spark.ml.GraftMlBridge
import org.apache.spark.ml.GraftMlBridge.{GCatSplit, GLeaf, GSplit, GTree}
import org.apache.spark.ml.classification.RandomForestClassificationModel

/** Compiles a fitted binary [[RandomForestClassificationModel]] into ANSI
  * SQL that replays Spark's scoring EXACTLY — closing the last `no_oracle`
  * gap: DuckDB cannot train a forest, but it can certainly evaluate one.
  *
  * Replay contract (mirrors `ProbabilisticClassificationModel` +
  * `RandomForestClassificationModel.predictRaw` step for step):
  *  - per tree, the leaf contribution to class c is `count_c / total` —
  *    both exact small integers from training, emitted as double literals,
  *    so the division is the same IEEE-754 op on every engine;
  *  - raw votes: `v_c = (c/t)_tree0 + (c/t)_tree1 + ...` accumulated in
  *    tree order (SQL `+` is left-associative = Spark's while-loop order);
  *  - prediction = argmax of raw votes, first max wins (`v1 > v0` → 1);
  *  - probability = votes normalized by `s = v0 + v1` (index order), and
  *    `prob` is the probability OF the predicted class (quirk Q3);
  *  - msg rounds prob to 2 dp the way Spark's `round` does — via the
  *    SHORTEST DECIMAL representation (`BigDecimal.valueOf`), replayed in
  *    SQL as `round(CAST(CAST(x AS STRING) AS DECIMAL(30, 25)), 2)`:
  *    double → shortest string → decimal → HALF_UP, not a binary-scaled
  *    round of the raw double (those diverge at e.g. 0.015, whose double
  *    is below the decimal midpoint).
  *
  * All arithmetic is plain CASE/compare/divide/add — dialect-portable
  * between Spark SQL (RfSqlCompilerSpec proves SQL ≡ model.transform) and
  * DuckDB (the driver's oracle run proves cross-engine).
  */
object RfSqlCompiler {

  /** Shortest-round-trip double literal, ALWAYS in E-notation: a bare
    * `5.0` parses as DECIMAL(2,1) in both Spark SQL and DuckDB — decimal
    * division would silently replace the IEEE ops this replay depends on —
    * while `5.0E0` is a DOUBLE literal on both engines, recovering the
    * exact bits. */
  private def fmt(d: Double): String = {
    val s = java.lang.Double.toString(d)
    if (s.contains("E")) s else s + "E0"
  }

  /** One tree's contribution to class `c`: a nested CASE ending in the
    * leaf's `count_c / total` division (total = left-to-right stats sum —
    * exact integers, order-insensitive). */
  private def treeExpr(t: GTree, c: Int, feat: Int => String): String = t match {
    case GLeaf(stats) =>
      // predictRaw skips a tree whose leaf class-count total is 0
      // (`if (total != 0)`); stats are compile-time literals, so the skip
      // compiles to a plain 0 contribution instead of a 0/0 division that
      // would error under ANSI/DuckDB where Spark scores fine. Fitted
      // leaves always carry >=1 sample, so this is the latent edge only.
      if (stats.sum == 0.0) "0.0E0"
      else s"${fmt(stats(c))} / ${fmt(stats.sum)}"
    case GSplit(fi, thr, l, r) =>
      s"CASE WHEN ${feat(fi)} <= ${fmt(thr)} " +
        s"THEN ${treeExpr(l, c, feat)} ELSE ${treeExpr(r, c, feat)} END"
    case GCatSplit(fi, cats, l, r) =>
      s"CASE WHEN ${feat(fi)} IN (${cats.map(fmt).mkString(", ")}) " +
        s"THEN ${treeExpr(l, c, feat)} ELSE ${treeExpr(r, c, feat)} END"
  }

  /** The two raw-vote expressions (v0, v1) over a row of the feature
    * frame; `feat(i)` renders the SQL expression for feature-vector slot
    * `i`. */
  def voteExprs(model: RandomForestClassificationModel,
      feat: Int => String): (String, String) = {
    val ts = GraftMlBridge.trees(model)
    require(model.numClasses == 2,
      s"binary forest expected, got ${model.numClasses} classes")
    def votes(c: Int) = ts.map(t => s"(${treeExpr(t, c, feat)})").mkString("\n      + ")
    (votes(0), votes(1))
  }

  /** Full scoring SELECT over a CTE/table `src` that carries the feature
    * columns plus `rowId`/`winPeriod` — emits the exact `ml_rf_score`
    * output frame (rowId, winPeriod, prediction, prob, msg). */
  def scoreSelectSql(model: RandomForestClassificationModel,
      feat: Int => String, src: String): String = {
    val (v0, v1) = voteExprs(model, feat)
    s"""votes AS (
       |  SELECT "rowId", "winPeriod",
       |    ($v0) AS v0,
       |    ($v1) AS v1
       |  FROM $src),
       |scored AS (
       |  SELECT "rowId", "winPeriod",
       |    CAST(CASE WHEN v1 > v0 THEN 1 ELSE 0 END AS DOUBLE) AS prediction,
       |    CASE WHEN v1 > v0 THEN v1 / (v0 + v1) ELSE v0 / (v0 + v1) END AS prob
       |  FROM votes)
       |SELECT "rowId", "winPeriod", prediction, prob,
       |  CAST(CAST(prediction AS INT) AS STRING) || ',' ||
       |    CAST(CAST(round(CAST(CAST(prob AS STRING) AS DECIMAL(30, 25)), 2)
       |              AS DOUBLE) AS STRING) AS msg
       |FROM scored
       |ORDER BY "rowId"""".stripMargin
  }
}
