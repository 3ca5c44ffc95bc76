package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** LLM-data-pipeline operator queries (dedup / similarity / text /
  * multimodal). Populated as the operators land. */
object PipelineQueries {
  type Q = (SparkSession, String) => DataFrame
  val queries: Map[String, Q] = Map()
  val oracles: Map[String, String] = Map()
}
