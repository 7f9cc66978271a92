package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T}

/** One-call training-corpus cleaning — the composite the individual
  * operators exist for: usable-text filter (P2/P7) → quality gate →
  * near-dup removal (exact n-gram Jaccard, keep the smallest id of
  * each duplicate pair). Input must expose (doc_id, text); output is
  * the kept documents with their quality score.
  *
  * Every stage is partition-parallel (the dup stage is the PPJoin
  * prefix-filtered join); nothing materializes on the driver beyond
  * the shingle-frequency dictionary.
  */
object CorpusPipeline {

  def cleanCorpus(spark: SparkSession, docs: DataFrame,
      minQuality: Double = 0.5, tau: Double = 0.5,
      shingleN: Int = 3): DataFrame = {
    // Spread small single-file inputs across cores before the
    // regex-heavy quality stage (a no-op at scale, where the input
    // already has >= cores partitions).
    val usable = Repartitioning.spreadSmallScan(docs)
      .where(T.usable_text(col("text")) && trim(col("text")) =!= "")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val view = s"corpus_clean_${System.identityHashCode(docs)}"
    usable.createOrReplaceTempView(view)
    val quality = spark.sql(
      TextAnalysis.qualitySql(TextAnalysis.SparkDialect, view))

    // The duplicate-pair set is tiny relative to the corpus (it IS the
    // redundancy being removed); materialize it once so the expensive
    // similarity join executes exactly once instead of re-running
    // inside the final anti-join's lineage.
    //
    // Pairs are computed on the UNFILTERED input and then restricted
    // to usable ids: Jaccard depends only on each document's text, so
    // pairs(filtered corpus) == pairs(full corpus) ∩ usable×usable,
    // and the full-corpus result is shared (memoized) with direct
    // jaccardPairs callers over the same input — one similarity join
    // per corpus per JVM instead of one per filter variant.
    val dups = Dedup.jaccardPairs(docs, "doc_id", "text",
      n = shingleN, tau = tau)
    val usableIds = usable.select(col("doc_id"))
    val removedRows = dups
      .join(usableIds.withColumnRenamed("doc_id", "i"), Seq("i"),
        "left_semi")
      .join(usableIds.withColumnRenamed("doc_id", "j"), Seq("j"),
        "left_semi")
      .select(col("j").as("doc_id")).distinct()
      .collect()
    val removed = spark.createDataFrame(
      java.util.Arrays.asList(removedRows: _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          usable.schema("doc_id").dataType))))

    usable
      .join(quality, "doc_id")
      .where(col("quality") >= minQuality)
      .join(broadcast(removed), Seq("doc_id"), "left_anti")
  }
}
