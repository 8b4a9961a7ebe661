package graft

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.{Processor, SemanticNode, TrainingData}
import graft.sinks.{Jats, Tei}
import graft.sources.AltoReader

/** The library facade: the reference's end-to-end flows
  * (`app/parser.py` ScienceBeamParser sessions — parse a document
  * collection, get TEI/JATS/assets/training data back) as composable
  * Spark stages. A user of the reference maps their calls here:
  *
  * {{{
  * val tokens = Graft.readAlto(spark, "hdfs:///corpus/alto/")    // ingest
  * val nodes  = Graft.process(tokens)                            // models + folds
  * val tei    = Graft.toTei(nodes)                               // (doc_id, tei)
  * val jats   = Graft.toJats(tei)                                // (doc_id, jats)
  * val train  = Graft.headerTrainingData(tokens)                 // retraining corpus
  * }}}
  *
  * Every stage is a plain DataFrame-in/DataFrame-out function: they
  * compose with the corpus operators ([[operators.Dedup]],
  * [[operators.TextAnalysis]], [[operators.Similarity]]) and run
  * unchanged under Structured Streaming where marked.
  */
object Graft {

  /** ALTO XML directory → exploded token table (A2 + B1-B3). Set
    * `permissive` to drop malformed files instead of failing the job;
    * pair with [[quarantine]] for the dead-letter record. */
  def readAlto(spark: SparkSession, path: String,
      permissive: Boolean = false): DataFrame = {
    import spark.implicits._
    if (!permissive) AltoReader.readDirectory(spark, path)
    else {
      val raw = spark.read.format("binaryFile").load(path)
        .select(xxhash64(col("path")).as("doc_id"),
          col("content").cast("string").as("xml"))
        .as[(Long, String)]
      AltoReader.tokensPermissive(raw).toDF()
    }
  }

  /** Streaming ingestion: the same token table as [[readAlto]], fed
    * incrementally as new ALTO files land (StreamingSpec proves the
    * foreachBatch pipeline output equals the batch run). */
  def readAltoStream(spark: SparkSession, path: String): DataFrame =
    graft.streaming.StreamOps.streamingAltoTokens(spark, path)

  /** JSONL corpus ingestion (the Dolma/FineWeb interchange shape) into
    * the documents schema — the whole operator surface (dedup,
    * curation, mixture, sharding) runs on it unchanged; pair with
    * [[sources.JsonlCorpus.quarantine]] for malformed lines (or
    * [[sources.JsonlCorpus.readAll]] for both sides in one scan) and
    * [[sources.JsonlCorpus.write]] for the export side. Ids for lines
    * without an explicit `doc_id` are content hashes — NOT monotone;
    * renumber with [[operators.Curation.assignMonotoneIds]] before
    * feeding deliveries to the incremental curation funnel. */
  def readDocumentsJsonl(spark: SparkSession, path: String): DataFrame =
    sources.JsonlCorpus.read(spark, path)

  /** Dead-letter record for a permissive read: (doc_id, error). */
  def quarantine(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val raw = spark.read.format("binaryFile").load(path)
      .select(xxhash64(col("path")).as("doc_id"),
        col("content").cast("string").as("xml"))
      .as[(Long, String)]
    AltoReader.quarantine(raw)
  }

  /** The full document DAG (segmentation → header/fulltext/references
    * models → folds → id assignment; optional graphics attachment). */
  def process(tokens: DataFrame, config: Processor.Config = Processor.Config(),
      graphics: Option[DataFrame] = None): Dataset[SemanticNode] =
    Processor.documentPipeline(tokens, config, graphics)

  /** Semantic nodes → (doc_id, tei) TEI documents (A6). */
  def toTei(nodes: Dataset[SemanticNode]): DataFrame =
    Tei.serialize(nodes.toDF())

  /** TEI → (doc_id, jats) via the XSLT transformation (A7). */
  def toJats(tei: DataFrame): DataFrame = Jats.serialize(tei)

  /** One-call convenience: token table → (doc_id, tei, jats). The TEI
    * table is materialized once (localCheckpoint) so the pipeline does
    * not run twice for the two output formats. */
  def parse(tokens: DataFrame,
      config: Processor.Config = Processor.Config()): DataFrame = {
    val tei = CacheRegistry.localCheckpoint(toTei(process(tokens, config)))
    tei.join(toJats(tei), "doc_id")
  }

  /** Return the session's executor storage to baseline: release every
    * cache the library registered ([[CacheRegistry]]) — persisted
    * narrow projections, checkpoint blocks of the document pipeline
    * and the dedup loops. Ephemeral caches only by default; pass
    * `includeShared = true` to also drop the warm cross-query caches
    * (the [[operators.TextAnalysis.tokenPairs]] tokenize pass). Call
    * after the frames a query returned are fully consumed. */
  def releaseCaches(spark: SparkSession,
      includeShared: Boolean = false): Unit =
    CacheRegistry.release(spark, includeShared)

  /** Training-data regeneration (per-model `training_data.py`):
    * header-model training TEI from the rule/CRF labeling. */
  def headerTrainingData(tokens: DataFrame): DataFrame =
    TrainingData.headerTrainingXml(new pipeline.RuleLabeler().label(tokens))

  /** Segmentation-model training TEI. */
  def segmentationTrainingData(tokens: DataFrame): DataFrame =
    TrainingData.segmentationTrainingXml(
      new pipeline.SegmentationRuleLabeler().label(tokens))
}
