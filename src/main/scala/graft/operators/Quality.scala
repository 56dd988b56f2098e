package graft.operators

import org.apache.spark.sql.functions._
import graft.core.Tables

/** Gopher/CCNet-style document-quality metric — the ONE definition shared
  * by `text_quality`, the curation funnel, the per-source cap, and the
  * token-budget selection (both engine sides). Lives in its own object so
  * TextOps and Sampling can both depend on it without an object-init
  * cycle (an uninitialized-val read renders as `null` inside an oracle
  * SQL string — a parse error, not a subtle wrong answer, but still).
  *
  * All ratios are exact integer divisions; the 0–3 score counts passed
  * gates (mean-word-length ∈ [3,10], stopwords present, digit ratio
  * < 0.2) via cross-multiplied integer comparisons — no float boundary
  * risk on either engine.
  */
object Quality {

  /** SQL CTE chain ending in `m(doc_id, n_tokens, n_stop, n_digit,
    * n_letters)`. */
  val metricsSqlCte: String =
    """t AS (SELECT doc_id, string_split(text, ' ') AS toks, length(text) AS n_chars
      |      FROM documents),
      |m AS (SELECT doc_id,
      |             len(toks) AS n_tokens,
      |             len(list_filter(toks, x -> x IN ('the','a','of','and','in','to','is'))) AS n_stop,
      |             len(list_filter(toks, x -> regexp_full_match(x, '[0-9]+'))) AS n_digit,
      |             n_chars - len(toks) + 1 AS n_letters
      |      FROM t)""".stripMargin

  /** SQL for the 0–3 quality score over `m`'s columns. */
  val scoreSql: String =
    """CAST((CASE WHEN n_letters >= 3 * n_tokens AND n_letters <= 10 * n_tokens
      |           THEN 1 ELSE 0 END)
      |   + (CASE WHEN n_stop > 0 THEN 1 ELSE 0 END)
      |   + (CASE WHEN 5 * n_digit < n_tokens THEN 1 ELSE 0 END) AS INT)""".stripMargin

  /** Spark side of `m` + the quality score column. */
  def metrics(s: org.apache.spark.sql.SparkSession, d: String) = {
    val stopList = Seq("the", "a", "of", "and", "in", "to", "is")
    Tables.documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("toks"),
        length(col("text")).as("n_chars"))
      .select(col("doc_id"),
        size(col("toks")).as("n_tokens"),
        size(filter(col("toks"), t => t.isInCollection(stopList))).as("n_stop"),
        size(filter(col("toks"), t => t.rlike("^[0-9]+$"))).as("n_digit"),
        (col("n_chars") - size(col("toks")) + 1).as("n_letters"))
      .withColumn("quality",
        (when(col("n_letters") >= lit(3) * col("n_tokens") &&
              col("n_letters") <= lit(10) * col("n_tokens"), 1).otherwise(0)
          + when(col("n_stop") > 0, 1).otherwise(0)
          + when(lit(5) * col("n_digit") < col("n_tokens"), 1).otherwise(0))
          .cast("int"))
  }
}
