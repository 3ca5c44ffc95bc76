package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** FST-domain operator queries (synthesized record catalogs with
  * DuckDB-mirrored construction). Populated as the operators land. */
object FstQueries {
  type Q = (SparkSession, String) => DataFrame
  val queries: Map[String, Q] = Map()
  val oracles: Map[String, String] = Map()
}
