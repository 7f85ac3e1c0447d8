package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reader for the reference's legacy sink layout (SURVEY.md §7.4): bare
  * `yyyy/mm/dd/file.json` S3 keys WITHOUT Hive `year=` markers (reference
  * src/extract_github_data.py:572-578). New data is written Hive-style by
  * IngestPipeline.writePartitioned; this reader makes the historical
  * layout queryable — including reconstructing the partition columns from
  * the path so date filters still prune work downstream.
  */
object LegacyLayout {

  /** Read the bare date-dir JSON layout and restore year/month/day
    * columns from the directory structure. */
  def readJson(spark: SparkSession, base: String,
      schema: org.apache.spark.sql.types.StructType = RepoSchema.flat): DataFrame = {
    spark.read.schema(schema)
      .json(s"${base.stripSuffix("/")}/*/*/*/*.json")
      // .../<year>/<month>/<day>/<file> — 0-based from the path tail
      .withColumn("_p", split(input_file_name(), "/"))
      .withColumn("year", expr("CAST(_p[size(_p)-4] AS INT)"))
      .withColumn("month", expr("CAST(_p[size(_p)-3] AS INT)"))
      .withColumn("day", expr("CAST(_p[size(_p)-2] AS INT)"))
      .drop("_p")
  }
}
