package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for each left row, the single right row with the
  * largest ordering value not exceeding (strict: strictly below) the
  * left row's — "the most recent quote before this trade", "the user's
  * last event before this one". Spark has no ASOF JOIN operator
  * (DuckDB/Pandas do), but the semantics decompose onto existing
  * operators with ONE shuffle and no join at all:
  *
  *   union(tag sides) -> Window.partitionBy(keys).orderBy(ord, side)
  *     last(rightPayload, ignoreNulls) rows unbounded-preceding..current
  *   -> filter left rows, unpack payload
  *
  * The union sorts both sides together, so each left row picks up the
  * running "latest right payload seen" — exactly the as-of match. A
  * naive range join (l.ord >= r.ord) explodes to O(|L|·|R|) per key
  * before a per-l argmax re-aggregation; this stays O((|L|+|R|) log) in
  * the partition sort the window pays anyway.
  *
  * Scale shape: one hash shuffle on `keys` (both inputs co-partitioned),
  * whole rows never replicated. Key skew concentrates a hot key's rows
  * into one task like any window does — pre-filter the right side or
  * bucket hot keys if a key exceeds a task's memory. The strictness
  * tie-break is encoded in the sort (left-before-right at equal `ord`
  * for strict, right-before-left for inclusive) — no ambiguity when the
  * same ordering value appears on both sides.
  *
  * Reference has no joins beyond the pagination self-join
  * (cmd/root.go:347-357); this is an extension operator for the
  * training-data pipeline surface (sessionized attribution, feature
  * as-of lookup).
  */
object AsOfJoin {

  /** Left as-of join of `left` to `right` on equal `keys` and the
    * backward match on `ord` (present in both sides). Right columns are
    * emitted with prefix `rightPrefix`; unmatched left rows keep nulls.
    *
    * Determinism: when several RIGHT rows share one (keys, ord) value,
    * whichever sorts last within that tie wins — partition-order
    * nondeterministic, as in any engine's as-of tie. Use an ordering
    * column that is unique per key (event ids, sequence numbers) when
    * the match must be reproducible; qj01 orders on the globally-unique
    * event_id for exactly this reason.
    *
    * @param strict if true, match requires r.ord < l.ord (the row
    *               itself / simultaneous right rows don't match);
    *               if false, r.ord <= l.ord.
    */
  def asofBackward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      ord: String,
      rightPrefix: String = "r_",
      strict: Boolean = false): DataFrame =
    // sort position of a right row relative to a left row with EQUAL ord:
    // strict   -> right sorts after  (excluded from "preceding")
    // inclusive-> right sorts before (included)
    asofDirected(left, right, keys, ord, rightPrefix,
      rightSideRank = if (strict) 1 else -1, forward = false)

  /** Forward as-of join: for each left row, the FIRST right row with
    * r.ord STRICTLY after the left's — "the next event after this one"
    * (DuckDB renders it as ASOF with l.ord < r.ord). The same single
    * union + sort + window pass as [[asofBackward]] with the frame
    * looking FORWARD; equal-ord right rows sort BEFORE left rows and
    * fall outside the frame ("next" never means "simultaneous").
    * Same right-side tie caveat as [[asofBackward]]. */
  def asofForward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      ord: String,
      rightPrefix: String = "r_"): DataFrame =
    asofDirected(left, right, keys, ord, rightPrefix,
      rightSideRank = -1, forward = true)

  private def asofDirected(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      ord: String,
      rightPrefix: String,
      rightSideRank: Int,
      forward: Boolean): DataFrame = {
    require(keys.nonEmpty, "asof join needs at least one equality key")
    val rightPayloadCols = right.columns.filterNot(keys.contains).toSeq
    val leftCols = left.columns.toSeq

    // right rows carry their payload in one struct; left rows carry null
    val payload = struct(rightPayloadCols.map(right(_)): _*)

    // NULL ordering values never participate in an as-of match (a
    // comparison-based formulation — DuckDB ASOF, l.ord >= r.ord — is
    // never true for NULL). Without this filter a null-ord right row
    // would sort nulls-first and become the running "last payload" for
    // every left row in its key. Left rows with a null ord likewise
    // match nothing: they sort before all right rows, so the running
    // payload is still null there — no filter needed on the left side.
    val nonNullRight = right.where(col(ord).isNotNull)
    val taggedRight = nonNullRight.select(
      keys.map(col) ++ Seq(
        col(ord).as("__ord"),
        lit(rightSideRank).as("__side"),
        payload.as("__payload")) ++
        leftCols.filterNot(keys.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(s"__l_$c")): _*)
    val taggedLeft = left.select(
      keys.map(col) ++ Seq(
        col(ord).as("__ord"),
        lit(0).as("__side"),
        lit(null).cast(taggedRight.schema("__payload").dataType).as("__payload")) ++
        leftCols.filterNot(keys.contains).map(c => col(c).as(s"__l_$c")): _*)

    val sortedW = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__ord").asc, col("__side").asc)
    val (w, pick) =
      if (forward)
        (sortedW.rowsBetween(Window.currentRow, Window.unboundedFollowing),
          first(col("__payload"), ignoreNulls = true))
      else
        (sortedW.rowsBetween(Window.unboundedPreceding, Window.currentRow),
          last(col("__payload"), ignoreNulls = true))

    val matched = taggedLeft
      .unionByName(taggedRight)
      .withColumn("__match", pick.over(w))
      .where(col("__side") === 0)

    val leftOut: Seq[Column] = leftCols.map { c =>
      if (keys.contains(c)) col(c) else col(s"__l_$c").as(c)
    }
    // a null-ord LEFT row sorts nulls-first: harmless backward (running
    // payload still null there) but the FORWARD frame would hand it the
    // key's first right row — null it explicitly (no-match, matching
    // the comparison formulation where NULL < r.ord is never true)
    val guard = if (forward) col(s"__l_$ord").isNotNull else lit(true)
    val rightOut: Seq[Column] =
      rightPayloadCols.map(c =>
        when(guard, col("__match").getField(c)).as(s"$rightPrefix$c"))
    matched.select(leftOut ++ rightOut: _*)
  }

  /** Nearest as-of join: for each left row, the right row with the
    * MINIMUM absolute `ord` distance in either direction (tie → the
    * backward match, the "no lookahead unless strictly closer"
    * convention) — "the quote closest in time to this trade". Computed
    * in the SAME single union + window pass as [[asofBackward]]: the
    * sorted partition yields the running last-before AND first-after
    * payload (two frames over one sort — no second shuffle), and a
    * per-row comparison picks the closer side. Same determinism caveat
    * as [[asofBackward]] for right-side `ord` ties; `ord` must be
    * numeric (distances subtract). */
  def asofNearest(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      ord: String,
      rightPrefix: String = "r_"): DataFrame = {
    require(keys.nonEmpty, "asof join needs at least one equality key")
    val rightPayloadCols = right.columns.filterNot(keys.contains).toSeq
    val leftCols = left.columns.toSeq
    val payload = struct(rightPayloadCols.map(right(_)): _*)
    val nonNullRight = right.where(col(ord).isNotNull)
    val taggedRight = nonNullRight.select(
      keys.map(col) ++ Seq(
        col(ord).as("__ord"),
        lit(-1).as("__side"),
        payload.as("__payload")) ++
        leftCols.filterNot(keys.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(s"__l_$c")): _*)
    val taggedLeft = left.select(
      keys.map(col) ++ Seq(
        col(ord).as("__ord"),
        lit(0).as("__side"),
        lit(null).cast(taggedRight.schema("__payload").dataType).as("__payload")) ++
        leftCols.filterNot(keys.contains).map(c => col(c).as(s"__l_$c")): _*)
    val ordering = Seq(col("__ord").asc, col("__side").asc)
    val wB = Window.partitionBy(keys.map(col): _*)
      .orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(keys.map(col): _*)
      .orderBy(ordering: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val db = col("__ord") - col("__b").getField(ord)
    val df = col("__f").getField(ord) - col("__ord")
    val matched = taggedLeft
      .unionByName(taggedRight)
      .withColumn("__b", last(col("__payload"), ignoreNulls = true).over(wB))
      .withColumn("__f", first(col("__payload"), ignoreNulls = true).over(wF))
      .where(col("__side") === 0)
      // a null-ord left row matches nothing (it sorts nulls-first, so
      // the forward frame would otherwise hand it the earliest right)
      .withColumn("__match",
        when(col("__ord").isNull, lit(null).cast(taggedRight.schema("__payload").dataType))
          .when(col("__b").isNull, col("__f"))
          .when(col("__f").isNull, col("__b"))
          .when(df < db, col("__f"))
          .otherwise(col("__b")))
    val leftOut: Seq[Column] = leftCols.map { c =>
      if (keys.contains(c)) col(c) else col(s"__l_$c").as(c)
    }
    val rightOut: Seq[Column] =
      rightPayloadCols.map(c => col("__match").getField(c).as(s"$rightPrefix$c"))
    matched.select(leftOut ++ rightOut: _*)
  }

  /** Tolerance-bounded backward as-of: like [[asofBackward]], but a
    * match older than `maxGap` (in `ord` units — numeric ordering
    * column) is DISCARDED: the left row survives with null right
    * columns, exactly a left join whose only candidate fell out of the
    * window. "The most recent quote, but only if it is fresh enough" —
    * the standard staleness bound on feature as-of lookups. A pure
    * post-projection on the as-of result (the window pass already found
    * the nearest match; a match farther than maxGap proves no closer
    * one exists), so the scale shape is unchanged: one shuffle, no
    * replication. */
  def asofBackwardWithin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      ord: String,
      maxGap: Long,
      rightPrefix: String = "r_",
      strict: Boolean = false): DataFrame = {
    require(maxGap >= 0, s"bad maxGap=$maxGap")
    val joined = asofBackward(left, right, keys, ord, rightPrefix, strict)
    val rOrd = col(s"$rightPrefix$ord")
    val fresh = rOrd.isNotNull && (col(ord) - rOrd <= lit(maxGap))
    right.columns.filterNot(keys.contains).foldLeft(joined) { (df, c) =>
      df.withColumn(s"$rightPrefix$c", when(fresh, col(s"$rightPrefix$c")))
    }
  }

  /** [[asofForward]] bounded to `maxGap` ahead: the first right row in
    * (l.ord, l.ord + maxGap] — "the next click within 30 minutes".
    * Matches beyond the horizon null out, exactly like
    * [[asofBackwardWithin]]'s staleness bound. */
  def asofForwardWithin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      ord: String,
      maxGap: Long,
      rightPrefix: String = "r_"): DataFrame = {
    require(maxGap >= 0, s"bad maxGap=$maxGap")
    val joined = asofForward(left, right, keys, ord, rightPrefix)
    val rOrd = col(s"$rightPrefix$ord")
    val fresh = rOrd.isNotNull && (rOrd - col(ord) <= lit(maxGap))
    right.columns.filterNot(keys.contains).foldLeft(joined) { (df, c) =>
      df.withColumn(s"$rightPrefix$c", when(fresh, col(s"$rightPrefix$c")))
    }
  }

  /** Time-interpolated as-of: each left row gets the right series'
    * `value` LINEARLY INTERPOLATED at its ordinate — the feature-join
    * semantics for continuous signals (sensor alignment, price marks,
    * resampling onto a grid), where "last value" (asofBackward) is a
    * step-function approximation. Bracketing uses the SAME single
    * union + sort + two-frame window pass as [[asofNearest]] — one
    * shuffle, no replication, scale shape unchanged.
    *
    * Edge semantics, in precedence order: null left ordinate → null;
    * no earlier point → first later value (backfill); no later point →
    * last earlier value (hold); an exact-ordinate hit → that point's
    * value VERBATIM (short-circuited BEFORE the formula — both
    * engines' formulas would otherwise divide 0/0 when the same point
    * brackets both sides); otherwise
    * `vb + (vf − vb) · ((t − tb) / (tf − tb))` with the ordinate
    * deltas cast to double in that exact order, so results are
    * bit-identical to the oracle's rendition. `ord` must be numeric
    * (cast timestamps to epoch micros first, as qj02/qj04 do). */
  def asofInterpolate(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      ord: String,
      value: String,
      rightPrefix: String = "r_"): DataFrame = {
    require(keys.nonEmpty, "asof join needs at least one equality key")
    val rightPayloadCols = right.columns.filterNot(keys.contains).toSeq
    require(rightPayloadCols.contains(value), s"right side lacks value column $value")
    val leftCols = left.columns.toSeq
    val payload = struct(rightPayloadCols.map(right(_)): _*)
    val nonNullRight = right.where(col(ord).isNotNull)
    val taggedRight = nonNullRight.select(
      keys.map(col) ++ Seq(
        col(ord).as("__ord"),
        lit(-1).as("__side"),
        payload.as("__payload")) ++
        leftCols.filterNot(keys.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(s"__l_$c")): _*)
    val taggedLeft = left.select(
      keys.map(col) ++ Seq(
        col(ord).as("__ord"),
        lit(0).as("__side"),
        lit(null).cast(taggedRight.schema("__payload").dataType).as("__payload")) ++
        leftCols.filterNot(keys.contains).map(c => col(c).as(s"__l_$c")): _*)
    val ordering = Seq(col("__ord").asc, col("__side").asc)
    val wB = Window.partitionBy(keys.map(col): _*)
      .orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(keys.map(col): _*)
      .orderBy(ordering: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val tb = col("__b").getField(ord)
    val tf = col("__f").getField(ord)
    val vb = col("__b").getField(value).cast("double")
    val vf = col("__f").getField(value).cast("double")
    val frac = (col("__ord") - tb).cast("double") / (tf - tb).cast("double")
    val matched = taggedLeft
      .unionByName(taggedRight)
      .withColumn("__b", last(col("__payload"), ignoreNulls = true).over(wB))
      .withColumn("__f", first(col("__payload"), ignoreNulls = true).over(wF))
      .where(col("__side") === 0)
      .withColumn(s"$rightPrefix$value",
        when(col("__ord").isNull, lit(null).cast("double"))
          .when(col("__b").isNull && col("__f").isNull, lit(null).cast("double"))
          .when(col("__b").isNull, vf)
          .when(col("__f").isNull, vb)
          .when(tb === col("__ord"), vb)
          .otherwise(vb + (vf - vb) * frac))
    val leftOut: Seq[Column] = leftCols.map { c =>
      if (keys.contains(c)) col(c) else col(s"__l_$c").as(c)
    }
    matched.select(leftOut :+ col(s"$rightPrefix$value"): _*)
  }
}
