package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sheet-like ingestion (SURVEY.md §2.1 S1-S3): header-row CSV / JSON
  * lines in, canonical tracker schema out.
  *
  * The reference's tables are header-row sheets with dynamic, late-bound,
  * by-name schemas; extra columns are tolerated and per-sheet header
  * aliasing maps source names onto the canonical set
  * (`apps-scripts/code-LLM-intergration.js:45-79`,
  * `code-Extractor-withoutLLM.js:16-40`). Here: `header=true` readers +
  * an alias-and-project normalizer that is pure metadata work — the scan
  * stays pushdown/pruning-friendly because the projection is declared,
  * not computed. */
object SheetSources {

  /** Canonical tracker column set (HEADERS analog). */
  val TrackerColumns: Seq[String] = Seq(
    "link", "canonical_link", "company_auto", "role_auto", "status",
    "source", "li_invite", "li_followup")

  /** Per-sheet header aliasing (HEADERS_PER_SHEET analog): maps a
    * source's header names → canonical names. */
  type HeaderAliases = Map[String, String]

  /** S1: header-row CSV scan. */
  def readCsvSheet(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "false").csv(path)

  /** S1: JSON-lines scan. */
  def readJsonSheet(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  /** S2: late-bound schema normalization — rename aliased headers,
    * tolerate extras (dropped by the final project), add any missing
    * canonical columns as empty strings, first-duplicate-wins on name
    * collisions (reference `getHeaderMap_` keeps the first occurrence). */
  def normalize(df: DataFrame, aliases: HeaderAliases = Map.empty,
                canonical: Seq[String] = TrackerColumns): DataFrame = {
    val seen = scala.collection.mutable.Set[String]()
    val renamed = df.columns.foldLeft(df) { (d, c) =>
      val target = aliases.getOrElse(c, c)
      if (seen.contains(target)) d.drop(c)
      else { seen += target; if (target == c) d else d.withColumnRenamed(c, target) }
    }
    val withAll = canonical.foldLeft(renamed) { (d, c) =>
      if (d.columns.contains(c)) d else d.withColumn(c, lit(""))
    }
    withAll.select(canonical.map(col): _*)
  }

  /** S2/S3 damaged-header self-repair (reference `getNotesQueueSheet_`,
    * `apps-scripts/code-LLM-intergration.js:111-119`): if the first
    * header cell no longer matches the expected first canonical name
    * (case-insensitive contains), somebody overwrote the header row —
    * silently restore it by renaming the first N columns positionally to
    * the canonical names. Columns past the canonical width keep their
    * names (normalize() tolerates extras). Pure metadata work: no scan,
    * no shuffle, pushdown-transparent. */
  def repairHeader(df: DataFrame,
                   canonical: Seq[String] = TrackerColumns): DataFrame = {
    val looksIntact = df.columns.headOption.exists(
      _.toLowerCase.contains(canonical.head.toLowerCase))
    if (looksIntact) df
    else df.columns.take(canonical.length).zip(canonical)
      .foldLeft(df) { case (d, (from, to)) => d.withColumnRenamed(from, to) }
  }

  /** S3 create-if-absent queue source: read the queue dir if it exists,
    * else an empty queue with the canonical schema.
    *
    * The probe goes through Hadoop's `FileSystem` resolved from the
    * session's configuration — so `hdfs://`, `s3a://`, and nested
    * partition layouts all detect correctly (a `java.io.File` probe would
    * silently report an existing remote queue as absent and re-admit all
    * in-flight work at the next enqueue). */
  def queueSource(spark: SparkSession, path: String): DataFrame = {
    val schema = "sheet_name STRING, row_index INT, url STRING, " +
      "status STRING, tries INT, enqueued_at TIMESTAMP, last_error STRING"
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasParquet = fs.exists(hPath) && {
      val files = fs.listFiles(hPath, /* recursive = */ true)
      var found = false
      while (!found && files.hasNext)
        found = files.next().getPath.getName.endsWith(".parquet")
      found
    }
    if (hasParquet)
      spark.read.parquet(path)
    else
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType.fromDDL(schema))
  }
}
