package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication of a document stream with BOUNDED
  * state — the streaming face of [[graft.operators.Dedup.exactGroups]].
  *
  * A plain `dropDuplicates` on an unbounded stream accumulates one state
  * row per distinct key forever (at 100 TB/day that state is the job's
  * death); `dropDuplicatesWithinWatermark` evicts fingerprints once the
  * watermark passes them, so state is proportional to the watermark
  * horizon, not the stream's lifetime. Duplicates in real corpora arrive
  * clustered (same crawl batch, same upload), which is exactly the
  * within-horizon case.
  */
object DedupStream {

  /** Drop rows whose content fingerprint was already seen within the
    * watermark horizon. Fingerprint = md5 of the text column (same key
    * as batch exact dedup), computed before the stateful operator so
    * state rows carry a 16-byte key, not the document.
    */
  def dedupByFingerprint(docs: DataFrame, tsCol: String, textCol: String,
      delayThreshold: String): DataFrame =
    docs.withColumn("fp", md5(col(textCol)))
      .withWatermark(tsCol, delayThreshold)
      .dropDuplicatesWithinWatermark("fp")
      .drop("fp")
}
