package graft.rec

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Recommend, Relational}

/** The tp2 `/recs` endpoint semantics (`tp2/app/main.py:62-89`) as a
  * library dispatch — the HTTP layer maps 1:1 onto this:
  *   - `co_occurrence`: global frequently-bought-together; `customer_id`
  *     is IGNORED (`main.py:92-123`);
  *   - `similarity` with a customer: 3-hop collaborative filtering
  *     (`main.py:144-153`); without: popularity fallback
  *     (`main.py:132-141`);
  *   - `pagerank`: order-frequency ranking — the reference's docstring
  *     admits GDS PageRank is not implemented (`main.py:175-187`); the
  *     real PageRank lives in [[graft.algo.PageRank]] and [[Engine]];
  *   - unknown strategy: IllegalArgumentException (the HTTP 400 analogue,
  *     `main.py:85-89`).
  */
object RecsApi {
  val Strategies: Set[String] = Set("co_occurrence", "similarity", "pagerank")

  /** T3: the reference clamps requested result counts to [1,10]
    * (`tp1/knoledge_graphs/api.py:66,82` — `max(1, min(10, top_n))`);
    * out-of-range values are clamped, never errors. Shared by every
    * API-level entry point (this dispatch, [[Engine.recommend]], the HTTP
    * front door). */
  def clampTopN(n: Int): Int = math.max(1, math.min(10, n))

  def recs(spark: SparkSession, dir: String, strategy: String,
      customerId: Option[Long] = None, limit: Int = 10): DataFrame = {
    val lim = clampTopN(limit)
    strategy match {
      case "co_occurrence" => Relational.coocTopk(spark, dir, lim)
      case "similarity" => customerId match {
        case Some(c) => Recommend.collabTopkFor(spark, dir, c, lim)
        case None    => Relational.popularityTopk(spark, dir, lim)
      }
      case "pagerank" => Relational.orderfreqTopk(spark, dir, lim)
      case other => throw new IllegalArgumentException(
        s"unknown strategy: $other (expected one of ${Strategies.mkString(", ")})")
    }
  }
}
