package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{AsOfJoin, RangeJoin}

/** Temporal-join inventory over `events`: backward as-of attribution and
  * bucketed band joins — the two join shapes the reference's pure
  * equi-join surface lacks entirely and a training-data pipeline needs
  * (feature as-of lookup, within-window interaction pairs).
  *
  * Oracles: DuckDB executes ASOF JOIN natively (an INDEPENDENT
  * implementation of the semantics — not a re-statement of our window
  * decomposition), and the band join oracles against the naive
  * inequality join the bucketed plan must be row-equal to. Ordering is
  * on `event_id`/integer microseconds, both unique per user, so the
  * match is deterministic; `value` passes through raw (per-row double,
  * bit-exact from parquet in both engines).
  */
object JoinQueries {

  private val bandLower = 1L // strictly after, in µs
  private val bandUpper = 4L * 3600L * 1000000L // 4 hours

  val all: Seq[Q] = Seq(
    Q(
      "qj01_asof_attribution",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        val purchases = ev.filter(col("event_type") === "purchase")
          .select("user_id", "event_id", "ts")
        val views = ev.filter(col("event_type") === "view")
          .select("user_id", "event_id", "ts", "value")
        AsOfJoin.asofBackward(
          purchases, views, Seq("user_id"), "event_id",
          rightPrefix = "prev_", strict = true)
      },
      Some("""SELECT l.user_id, l.event_id, l.ts,
                     r.event_id AS prev_event_id, r.ts AS prev_ts,
                     r.value AS prev_value
              FROM (SELECT * FROM events WHERE event_type = 'purchase') l
              ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') r
                ON l.user_id = r.user_id AND r.event_id < l.event_id""")),
    Q(
      "qj02_band_pairs",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        val views = ev.filter(col("event_type") === "view")
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("tus"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("tus"))
        RangeJoin.bandJoin(
          views, purchases, Seq("user_id"), "tus", "tus",
          bandLower, bandUpper, rightPrefix = "p_")
          .select(
            col("user_id"),
            col("event_id").as("view_id"),
            col("p_event_id").as("purchase_id"),
            (col("p_tus") - col("tus")).as("gap_us"))
      },
      Some(s"""SELECT l.user_id, l.event_id AS view_id,
                      r.event_id AS purchase_id,
                      epoch_us(r.ts) - epoch_us(l.ts) AS gap_us
               FROM (SELECT * FROM events WHERE event_type = 'view') l
               JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
                 ON l.user_id = r.user_id
                AND epoch_us(r.ts) - epoch_us(l.ts)
                      BETWEEN $bandLower AND $bandUpper""")),
    Q(
      "qj03_asof_within",
      // staleness-bounded as-of: attribute each purchase to the most
      // recent prior view ONLY when it is <= 2h old — older matches
      // null out (the left row survives, as in a left join whose
      // candidate aged out). Ordering on integer microseconds (unique
      // per user in the fixture), gap arithmetic exact.
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("tus"))
        val views = ev.filter(col("event_type") === "view")
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("tus"), col("value"))
        AsOfJoin.asofBackwardWithin(
          purchases, views, Seq("user_id"), "tus",
          maxGap = 2L * 3600L * 1000000L,
          rightPrefix = "prev_", strict = true)
      },
      Some("""SELECT l.user_id, l.event_id, epoch_us(l.ts) AS tus,
                     CASE WHEN epoch_us(l.ts) - epoch_us(r.ts) <= 7200000000 THEN r.event_id END AS prev_event_id,
                     CASE WHEN epoch_us(l.ts) - epoch_us(r.ts) <= 7200000000 THEN epoch_us(r.ts) END AS prev_tus,
                     CASE WHEN epoch_us(l.ts) - epoch_us(r.ts) <= 7200000000 THEN r.value END AS prev_value
              FROM (SELECT * FROM events WHERE event_type = 'purchase') l
              ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') r
                ON l.user_id = r.user_id AND epoch_us(r.ts) < epoch_us(l.ts)""")),
    Q(
      "qj04_asof_nearest",
      // nearest as-of: each purchase attributed to the view CLOSEST in
      // time, before or after (tie -> before) — sensor alignment /
      // closest-quote semantics. One union + window pass computes both
      // directions over a single sort; the oracle composes DuckDB's two
      // directional ASOF joins and picks the closer side.
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("tus"))
        val views = ev.filter(col("event_type") === "view")
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("tus"), col("value"))
        graft.operators.AsOfJoin.asofNearest(
          purchases, views, Seq("user_id"), "tus", rightPrefix = "near_")
      },
      Some("""WITH l AS (SELECT user_id, event_id, epoch_us(ts) AS tus
                         FROM events WHERE event_type = 'purchase'),
              r AS (SELECT user_id, event_id, epoch_us(ts) AS tus, value
                    FROM events WHERE event_type = 'view'),
              b AS (SELECT l.user_id, l.event_id, l.tus,
                           r.event_id AS b_id, r.tus AS b_tus, r.value AS b_val
                    FROM l ASOF LEFT JOIN r
                      ON l.user_id = r.user_id AND r.tus <= l.tus),
              f AS (SELECT l.event_id, r.event_id AS f_id, r.tus AS f_tus,
                           r.value AS f_val
                    FROM l ASOF LEFT JOIN r
                      ON l.user_id = r.user_id AND r.tus >= l.tus)
              SELECT b.user_id, b.event_id, b.tus,
                     CASE WHEN b_id IS NULL THEN f_id
                          WHEN f_id IS NULL THEN b_id
                          WHEN (f_tus - b.tus) < (b.tus - b_tus) THEN f_id
                          ELSE b_id END AS near_event_id,
                     CASE WHEN b_id IS NULL THEN f_tus
                          WHEN f_id IS NULL THEN b_tus
                          WHEN (f_tus - b.tus) < (b.tus - b_tus) THEN f_tus
                          ELSE b_tus END AS near_tus,
                     CASE WHEN b_id IS NULL THEN f_val
                          WHEN f_id IS NULL THEN b_val
                          WHEN (f_tus - b.tus) < (b.tus - b_tus) THEN f_val
                          ELSE b_val END AS near_value
              FROM b JOIN f ON b.event_id = f.event_id""")),
    Q(
      "qj05_asof_interpolate",
      // time-interpolated as-of: each purchase gets the view-value
      // series LINEARLY INTERPOLATED at its timestamp (hold/backfill
      // at the edges, verbatim on an exact hit) — the continuous-
      // signal feature join where last-value is a step-function
      // approximation. Same single union+sort window pass as qj04;
      // the oracle composes DuckDB's two directional ASOF joins and
      // evaluates the identical guarded formula. The exact-hit guard
      // runs BEFORE the formula on both engines: DuckDB's inclusive
      // forward ASOF hands the same point to both sides there, and
      // the unguarded formula would divide 0/0.
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("tus"))
        val views = ev.filter(col("event_type") === "view")
          .select(col("user_id"),
            unix_micros(col("ts")).as("tus"), col("value"))
        AsOfJoin.asofInterpolate(
          purchases, views, Seq("user_id"), "tus", "value",
          rightPrefix = "interp_")
      },
      Some("""WITH l AS (SELECT user_id, event_id, epoch_us(ts) AS tus
                         FROM events WHERE event_type = 'purchase'),
              r AS (SELECT user_id, epoch_us(ts) AS tus, value
                    FROM events WHERE event_type = 'view'),
              b AS (SELECT l.user_id, l.event_id, l.tus,
                           r.tus AS b_tus, r.value AS b_val
                    FROM l ASOF LEFT JOIN r
                      ON l.user_id = r.user_id AND r.tus <= l.tus),
              f AS (SELECT l.event_id, r.tus AS f_tus, r.value AS f_val
                    FROM l ASOF LEFT JOIN r
                      ON l.user_id = r.user_id AND r.tus >= l.tus)
              SELECT b.user_id, b.event_id, b.tus,
                     CASE WHEN b_tus IS NULL AND f_tus IS NULL THEN NULL
                          WHEN b_tus IS NULL THEN f_val
                          WHEN f_tus IS NULL THEN b_val
                          WHEN b_tus = b.tus THEN b_val
                          ELSE b_val + (f_val - b_val) *
                               (CAST(b.tus - b_tus AS DOUBLE) /
                                CAST(f_tus - b_tus AS DOUBLE)) END
                       AS interp_value
              FROM b JOIN f ON b.event_id = f.event_id""")),

    Q(
      "qj06_interval_overlap",
      // interval OVERLAP join — the third temporal-join shape (as-of:
      // one nearest; band: point ordinates in an offset window; here
      // BOTH sides are intervals and every concurrent pair qualifies):
      // 10-minute view windows x 30-minute purchase windows per user,
      // overlap length in µs. Bucketed decomposition (width = the max
      // interval length) keeps it a hash equi-join with left
      // replication 3 and no dedup; the oracle is the naive
      // inequality join the plan must be row-equal to.
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        val views = ev.filter(col("event_type") === "view")
          .select(col("user_id"), col("event_id").as("view_id"),
            unix_micros(col("ts")).as("vs"),
            (unix_micros(col("ts")) + lit(600000000L)).as("ve"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("purchase_id"),
            unix_micros(col("ts")).as("ps"),
            (unix_micros(col("ts")) + lit(1800000000L)).as("pe"))
        graft.operators.IntervalJoin.overlapJoin(
          views, purchases, Seq("user_id"), "vs", "ve", "ps", "pe",
          bucketWidth = 1800000000L, rightPrefix = "r_")
          .select(col("user_id"), col("view_id"),
            col("r_purchase_id").as("purchase_id"), col("overlap_us"))
      },
      Some("""WITH v AS (SELECT user_id, event_id AS view_id,
                                epoch_us(ts) AS s, epoch_us(ts) + 600000000 AS e
                         FROM events WHERE event_type = 'view'),
              p AS (SELECT user_id, event_id AS purchase_id,
                           epoch_us(ts) AS s, epoch_us(ts) + 1800000000 AS e
                    FROM events WHERE event_type = 'purchase')
              SELECT v.user_id, v.view_id, p.purchase_id,
                     least(v.e, p.e) - greatest(v.s, p.s) AS overlap_us
              FROM v JOIN p ON v.user_id = p.user_id
                            AND v.s < p.e AND p.s < v.e"""),
      bench = true),

    Q(
      "qj07_asof_forward",
      // forward as-of within a bound — "the NEXT purchase within 4
      // hours of this view" (qj03's mirror): one shuffle, union + sort
      // + forward window frame, never a range join. DuckDB executes
      // the forward direction natively (ASOF on v.tus < p.tus), an
      // independent implementation of the semantics. Output is
      // ord-derived only, so right-side ties cannot wobble it.
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        val views = ev.filter(col("event_type") === "view")
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("tus"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), unix_micros(col("ts")).as("tus"))
        AsOfJoin.asofForwardWithin(
          views, purchases, Seq("user_id"), "tus",
          maxGap = 4L * 3600L * 1000000L, rightPrefix = "next_")
          .select(col("user_id"), col("event_id"), col("tus"),
            col("next_tus"))
      },
      Some("""WITH v AS (SELECT user_id, event_id, epoch_us(ts) AS tus
                         FROM events WHERE event_type = 'view'),
              p AS (SELECT user_id, epoch_us(ts) AS tus
                    FROM events WHERE event_type = 'purchase')
              SELECT v.user_id, v.event_id, v.tus,
                     CASE WHEN p.tus - v.tus <= 14400000000 THEN p.tus END
                       AS next_tus
              FROM v ASOF LEFT JOIN p
                ON v.user_id = p.user_id AND v.tus < p.tus"""))
  )
}
