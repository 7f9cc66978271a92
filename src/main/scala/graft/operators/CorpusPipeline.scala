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
    val usable = docs
      .where(T.usable_text(col("text")) && trim(col("text")) =!= "")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val view = s"corpus_clean_${System.identityHashCode(docs)}"
    usable.createOrReplaceTempView(view)
    val quality = spark.sql(
      TextAnalysis.qualitySql(TextAnalysis.SparkDialect, view))

    val dups = Dedup.jaccardPairs(usable, "doc_id", "text",
      n = shingleN, tau = tau)
    val removed = dups.select(col("j").as("doc_id")).distinct()

    usable
      .join(quality, "doc_id")
      .where(col("quality") >= minQuality)
      .join(removed, Seq("doc_id"), "left_anti")
  }
}
