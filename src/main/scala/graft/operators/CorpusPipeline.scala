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
  * prefix-filtered join); nothing materializes on the driver — the
  * duplicate-pair set and removed-id set stay DataFrames end to end.
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

    // Pairs are computed on the UNFILTERED input and then restricted
    // to usable ids: Jaccard depends only on each document's text, so
    // pairs(filtered corpus) == pairs(full corpus) ∩ usable×usable,
    // and the full-corpus result is shared (memoized + persisted) with
    // direct jaccardPairs callers over the same input — one similarity
    // join per corpus per JVM instead of one per filter variant.
    //
    // The removed-id set stays a DataFrame end to end: web-scale
    // corpora are 30-50 % duplicates, so at 100 TB this set is
    // billions of ids — it must never pass through the driver. AQE
    // broadcasts the anti-join side when it turns out small.
    val dups = Dedup.jaccardPairs(docs, "doc_id", "text",
      n = shingleN, tau = tau)
    val usableIds = usable.select(col("doc_id"))
    val removed = dups
      .join(usableIds.withColumnRenamed("doc_id", "i"), Seq("i"),
        "left_semi")
      .join(usableIds.withColumnRenamed("doc_id", "j"), Seq("j"),
        "left_semi")
      .select(col("j").as("doc_id")).distinct()

    usable
      .join(quality, "doc_id")
      .where(col("quality") >= minQuality)
      .join(removed, Seq("doc_id"), "left_anti")
  }
}
