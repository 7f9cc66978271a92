package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, RangeJoin}

/** Temporal join operators over the events table: as-of join (latest
  * prior event attribution) and windowed range join — the two joins
  * Spark lacks natively, re-expressed in shuffle-bounded shapes. The
  * DuckDB oracles use that engine's NATIVE ASOF / inequality joins, so
  * the gate cross-checks two independent implementations.
  */
object TemporalQueries {
  private implicit class ColName(val sc: StringContext) {
    def $(args: Any*): org.apache.spark.sql.Column = col(sc.s(args: _*))
  }

  private val WindowSec = 3600L

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Attribution: each click joined to the user's most recent view at
    // or before it (inclusive backward as-of).
    "q_asof_join" -> ((s, dir) => {
      val ev = Tables(s, dir, "events")
      val clicks = ev.where($"event_type" === "click")
        .select($"event_id", $"user_id", $"ts")
      val views = ev.where($"event_type" === "view")
        .groupBy($"user_id", $"ts").agg(max($"event_id").as("view_id"))
      AsOfJoin.backward(clicks, views, "user_id", "ts", Seq("view_id"))
        .select($"event_id", $"user_id", $"ts", $"view_id",
          (unix_micros($"ts") - unix_micros($"asof_ts")).as("gap_us"))
        .orderBy($"event_id")
    }),

    // The tolerance-bounded as-of (pandas merge_asof semantics):
    // matches older than 30 minutes become no-match nulls. Exercises
    // the toleranceUs path of the same single-window operator.
    "q_asof_tolerance" -> ((s, dir) => {
      val ev = Tables(s, dir, "events")
      val clicks = ev.where($"event_type" === "click")
        .select($"event_id", $"user_id", $"ts")
      val views = ev.where($"event_type" === "view")
        .groupBy($"user_id", $"ts").agg(max($"event_id").as("view_id"))
      AsOfJoin.backward(clicks, views, "user_id", "ts", Seq("view_id"),
        toleranceUs = Some(1800L * 1000000L))
        .select($"event_id", $"user_id", $"ts", $"view_id",
          (unix_micros($"ts") - unix_micros($"asof_ts")).as("gap_us"))
        .orderBy($"event_id")
    }),

    // All view→click pairs per user within one hour (bucket-banded
    // equi-join; never a per-key cross product).
    "q_range_join" -> ((s, dir) => {
      val ev = Tables(s, dir, "events")
      RangeJoin.pairsWithin(
          ev.where($"event_type" === "view"),
          ev.where($"event_type" === "click"),
          "user_id", "ts", "event_id", windowUs = WindowSec * 1000000L)
        .orderBy($"i", $"j")
    }),

    // Per-type 3-sigma outlier detection over the event stream's value
    // column — the monitoring staple (metric spikes, fraud signals).
    // One partial-aggregated groupBy over 5 event types, stats
    // broadcast back into the scan: two passes, no wide shuffle of the
    // event rows themselves; at 100 TB the stats side is 5 rows.
    "q_event_anomaly" -> ((s, dir) => {
      val ev = Tables(s, dir, "events")
      val stats = ev.groupBy($"event_type")
        .agg(avg($"value").as("mu"), stddev_pop($"value").as("sigma"))
      ev.join(broadcast(stats), "event_type")
        .where($"sigma" > 0 && abs($"value" - $"mu") > lit(3) * $"sigma")
        .select($"event_id", $"event_type",
          round(($"value" - $"mu") / $"sigma", 3).as("z"))
        .orderBy($"event_id")
    }),

    // Robust (median/MAD) outlier gate — the breakdown-resistant
    // complement of q_event_anomaly's mean/σ z-score: a few extreme
    // rows cannot move the median, so contamination does not mask
    // itself. INTEGER-EXACT via the ×2 trick: med2 = 2·median(cents)
    // and mad4 = 4·MAD are integral even when the even-count median
    // interpolates at .5, and the 3σ-equivalent cut
    // dev > 3·1.4826·MAD becomes 10000·dev2 > 22239·mad4 — pure
    // BIGINT in both engines. Exact per-group medians are the
    // bounded-cardinality path (event types); unbounded keys use the
    // HDR/sample sketch family instead.
    "q_robust_outliers" -> ((s, dir) => {
      Tables(s, dir, "events").createOrReplaceTempView("events")
      s.sql("""
        WITH c AS (SELECT event_type,
            CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        m AS (SELECT event_type,
            CAST(2 * percentile(cents, 0.5) AS BIGINT) AS med2
          FROM c GROUP BY event_type),
        d AS (SELECT c.event_type, m.med2,
            abs(2 * c.cents - m.med2) AS dev2
          FROM c JOIN m ON m.event_type = c.event_type),
        md AS (SELECT event_type,
            CAST(2 * percentile(dev2, 0.5) AS BIGINT) AS mad4
          FROM d GROUP BY event_type)
        SELECT d.event_type AS event_type, d.med2 AS med2,
          md.mad4 AS mad4, count(*) AS n,
          sum(CASE WHEN 10000 * d.dev2 > 22239 * md.mad4
            THEN 1 ELSE 0 END) AS n_outliers
        FROM d JOIN md ON md.event_type = d.event_type
        GROUP BY d.event_type, d.med2, md.mad4
        ORDER BY d.event_type""")
    }),

    // Rolling 5-event mean per user in event-time order (tie-broken by
    // event_id so the frame is deterministic): the feature-engineering
    // window shape. One shuffle on user_id; frames never cross users.
    // Regular-grid resampling with LOCF fill (TimeSeries.resample):
    // per-user hourly series of the latest event value in cents, one
    // row per hour between the user's first and last event, filled
    // rows flagged observed=false. The user_id < 40 predicate keeps
    // the output SF-invariant (the grid depends on span, not volume)
    // and is pushed to the scan.
    "q_gap_fill" -> ((s, dir) => {
      val ev = Tables(s, dir, "events").where($"user_id" < 40)
        .withColumn("cents", expr("CAST(round(value * 100) AS BIGINT)"))
      graft.operators.TimeSeries
        .resample(ev, "user_id", "ts", "cents", 3600L)
        .orderBy($"key", $"bucket")
    }),

    // Same grid machinery at a 6-hour step with integer LINEAR
    // interpolation between the surrounding observations — truncating
    // division in both engines, so filled values hash-match.
    "q_resample_interp" -> ((s, dir) => {
      val ev = Tables(s, dir, "events").where($"user_id" < 40)
        .withColumn("cents", expr("CAST(round(value * 100) AS BIGINT)"))
      graft.operators.TimeSeries
        .resample(ev, "user_id", "ts", "cents", 21600L,
          interpolate = true)
        .orderBy($"key", $"bucket")
    }),

    "q_event_rolling" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables(s, dir, "events")
      val w = Window.partitionBy($"user_id")
        .orderBy($"ts", $"event_id").rowsBetween(-4, 0)
      ev.where($"event_type" === "purchase")
        .select($"event_id", $"user_id", $"ts",
          round(avg($"value").over(w), 4).as("avg5"),
          count(lit(1)).over(w).cast("int").as("n5"))
        .orderBy($"event_id")
    }),

    // The STREAMING interval-join operator run on its batch face —
    // same code path the attribution stream executes (watermarks are
    // no-ops in batch), gated against a plain inequality-join oracle.
    // 10-minute horizon, view inclusive-before click.
    "q_interval_join" -> ((s, dir) => {
      val ev = Tables(s, dir, "events")
      val views = ev.where($"event_type" === "view")
        .select($"event_id".as("view_id"), $"user_id".as("vuser"),
          $"ts".as("vts"))
      val clicks = ev.where($"event_type" === "click")
        .select($"event_id".as("click_id"), $"user_id".as("cuser"),
          $"ts".as("cts"))
      graft.streaming.EventStreams.intervalJoin(views, clicks,
        "vuser", "cuser", "vts", "cts", horizon = "10 minutes")
        .select($"click_id", $"view_id",
          (unix_micros($"cts") - unix_micros($"vts")).as("gap_us"))
        .orderBy($"click_id", $"view_id")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_asof_join" ->
      """WITH clicks AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
        |views AS (
        |  SELECT user_id, ts, max(event_id) AS view_id FROM events
        |  WHERE event_type = 'view' GROUP BY user_id, ts)
        |SELECT c.event_id, c.user_id, c.ts, v.view_id,
        |  epoch_us(c.ts) - epoch_us(v.ts) AS gap_us
        |FROM clicks c ASOF LEFT JOIN views v
        |  ON c.user_id = v.user_id AND c.ts >= v.ts
        |ORDER BY c.event_id""".stripMargin,
    // tolerance restated without ASOF: per click, the max in-window
    // view ts, then the (unique per user+ts) view row joined back
    "q_asof_tolerance" ->
      """WITH clicks AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
        |views AS (
        |  SELECT user_id, ts, max(event_id) AS view_id FROM events
        |  WHERE event_type = 'view' GROUP BY user_id, ts),
        |m AS (
        |  SELECT c.event_id, c.user_id, c.ts, max(v.ts) AS vts
        |  FROM clicks c LEFT JOIN views v
        |    ON c.user_id = v.user_id AND v.ts <= c.ts
        |    AND v.ts >= c.ts - INTERVAL 1800 SECONDS
        |  GROUP BY c.event_id, c.user_id, c.ts)
        |SELECT m.event_id, m.user_id, m.ts, v.view_id,
        |  epoch_us(m.ts) - epoch_us(m.vts) AS gap_us
        |FROM m LEFT JOIN views v
        |  ON v.user_id = m.user_id AND v.ts = m.vts
        |ORDER BY m.event_id""".stripMargin,
    "q_range_join" ->
      s"""SELECT a.event_id AS i, b.event_id AS j,
         |  epoch_us(b.ts) - epoch_us(a.ts) AS gap_us
         |FROM events a JOIN events b
         |  ON a.user_id = b.user_id
         |  AND a.event_type = 'view' AND b.event_type = 'click'
         |  AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL $WindowSec SECONDS
         |ORDER BY i, j""".stripMargin,
    // stats per type recomputed the naive way; same 3-sigma predicate
    // on the unrounded z, z rounded identically for the hash
    "q_event_anomaly" ->
      """WITH st AS (
        |  SELECT event_type, avg(value) AS mu, stddev_pop(value) AS sigma
        |  FROM events GROUP BY event_type)
        |SELECT e.event_id, e.event_type,
        |  round((e.value - st.mu) / st.sigma, 3) AS z
        |FROM events e JOIN st ON st.event_type = e.event_type
        |WHERE st.sigma > 0 AND abs(e.value - st.mu) > 3 * st.sigma
        |ORDER BY e.event_id""".stripMargin,
    // the same ×2-integralized median/MAD pipeline; DuckDB median ≡
    // Spark percentile(0.5) (both linear-interpolating), every
    // comparison BIGINT
    "q_robust_outliers" ->
      """WITH c AS (SELECT event_type,
        |    CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |m AS (SELECT event_type,
        |    CAST(2 * median(cents) AS BIGINT) AS med2
        |  FROM c GROUP BY event_type),
        |d AS (SELECT c.event_type, m.med2,
        |    abs(2 * c.cents - m.med2) AS dev2
        |  FROM c JOIN m ON m.event_type = c.event_type),
        |md AS (SELECT event_type,
        |    CAST(2 * median(dev2) AS BIGINT) AS mad4
        |  FROM d GROUP BY event_type)
        |SELECT d.event_type AS event_type, d.med2 AS med2,
        |  md.mad4 AS mad4, count(*) AS n,
        |  CAST(sum(CASE WHEN 10000 * d.dev2 > 22239 * md.mad4
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM d JOIN md ON md.event_type = d.event_type
        |GROUP BY d.event_type, d.med2, md.mad4
        |ORDER BY d.event_type""".stripMargin,
    // grid + LOCF restatement: latest-in-bucket via row_number (the
    // max(struct) tie order), generate_series grid, IGNORE NULLS
    // carry-forward window
    "q_gap_fill" ->
      """WITH obs0 AS (
        |  SELECT CAST(user_id AS BIGINT) AS key,
        |    (epoch_us(ts) // 1000000) // 3600 AS bucket, ts,
        |    CAST(round(value * 100) AS BIGINT) AS v
        |  FROM events WHERE user_id < 40),
        |ob AS (SELECT key, bucket, v FROM (
        |    SELECT key, bucket, v, row_number() OVER (
        |      PARTITION BY key, bucket ORDER BY ts DESC, v DESC) AS rn
        |    FROM obs0) WHERE rn = 1),
        |span AS (SELECT key, min(bucket) AS b0, max(bucket) AS b1
        |  FROM ob GROUP BY key),
        |grid AS (SELECT key,
        |    unnest(generate_series(b0, b1)) AS bucket FROM span),
        |j AS (SELECT g.key, g.bucket, ob.v FROM grid g
        |  LEFT JOIN ob ON ob.key = g.key AND ob.bucket = g.bucket)
        |SELECT key, bucket,
        |  last_value(v IGNORE NULLS) OVER (PARTITION BY key
        |    ORDER BY bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
        |  v IS NOT NULL AS observed
        |FROM j ORDER BY key, bucket""".stripMargin,
    // the interpolating variant: prev/next observation via IGNORE
    // NULLS windows, then the integer segment draw with truncating //
    "q_resample_interp" ->
      """WITH obs0 AS (
        |  SELECT CAST(user_id AS BIGINT) AS key,
        |    (epoch_us(ts) // 1000000) // 21600 AS bucket, ts,
        |    CAST(round(value * 100) AS BIGINT) AS v
        |  FROM events WHERE user_id < 40),
        |ob AS (SELECT key, bucket, v FROM (
        |    SELECT key, bucket, v, row_number() OVER (
        |      PARTITION BY key, bucket ORDER BY ts DESC, v DESC) AS rn
        |    FROM obs0) WHERE rn = 1),
        |span AS (SELECT key, min(bucket) AS b0, max(bucket) AS b1
        |  FROM ob GROUP BY key),
        |grid AS (SELECT key,
        |    unnest(generate_series(b0, b1)) AS bucket FROM span),
        |j AS (SELECT g.key, g.bucket, ob.v FROM grid g
        |  LEFT JOIN ob ON ob.key = g.key AND ob.bucket = g.bucket),
        |fb AS (SELECT key, bucket, v,
        |  last_value(v IGNORE NULLS) OVER wp AS pv,
        |  last_value(CASE WHEN v IS NOT NULL THEN bucket END
        |    IGNORE NULLS) OVER wp AS pb,
        |  first_value(v IGNORE NULLS) OVER wn AS nv,
        |  first_value(CASE WHEN v IS NOT NULL THEN bucket END
        |    IGNORE NULLS) OVER wn AS nb
        |  FROM j
        |  WINDOW wp AS (PARTITION BY key ORDER BY bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |  wn AS (PARTITION BY key ORDER BY bucket
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT key, bucket,
        |  CASE WHEN v IS NOT NULL THEN v
        |    WHEN pv IS NULL THEN nv
        |    WHEN nv IS NULL THEN pv
        |    ELSE pv + ((nv - pv) * (bucket - pb)) // (nb - pb)
        |  END AS value,
        |  v IS NOT NULL AS observed
        |FROM fb ORDER BY key, bucket""".stripMargin,
    "q_event_rolling" ->
      """SELECT event_id, user_id, ts,
        |  round(avg(value) OVER w, 4) AS avg5,
        |  CAST(count(*) OVER w AS INT) AS n5
        |FROM events WHERE event_type = 'purchase'
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "q_interval_join" ->
      """SELECT b.event_id AS click_id, a.event_id AS view_id,
        |  epoch_us(b.ts) - epoch_us(a.ts) AS gap_us
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id
        |  AND a.event_type = 'view' AND b.event_type = 'click'
        |  AND a.ts <= b.ts AND a.ts >= b.ts - INTERVAL 10 MINUTES
        |ORDER BY click_id, view_id""".stripMargin
  )
}
