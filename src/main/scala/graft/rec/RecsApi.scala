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

  def recs(spark: SparkSession, dir: String, strategy: String,
      customerId: Option[Long] = None, limit: Int = 10): DataFrame =
    strategy match {
      case "co_occurrence" => Relational.coocTopk(spark, dir, limit)
      case "similarity" => customerId match {
        case Some(c) => Recommend.collabTopkFor(spark, dir, c, limit)
        case None    => Relational.popularityTopk(spark, dir, limit)
      }
      case "pagerank" => Relational.orderfreqTopk(spark, dir, limit)
      case other => throw new IllegalArgumentException(
        s"unknown strategy: $other (expected one of ${Strategies.mkString(", ")})")
    }
}
