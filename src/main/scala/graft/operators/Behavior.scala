package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** User-behavior analytics over event streams: ordered funnels and cohort
  * retention — the product-analytics queries a datamart layer serves.
  */
object Behavior {

  /** Where a funnel's `within` conversion window is measured from — the two
    * standard product-analytics readings. */
  sealed trait ConversionAnchor
  /** Every later step must land within `within` of the user's FIRST step-1
    * event ("converted within a week of first visit"). */
  case object AnchorFirst extends ConversionAnchor
  /** Step k must land within `within` of the step-(k-1) qualifying event
    * ("each hop within an hour of the previous one") — the per-step
    * reading; total funnel latency may reach `steps.size - 1` windows. */
  case object AnchorPrevStep extends ConversionAnchor

  /** Ordered funnel: how many users completed step 1, then step 2 AFTER
    * their first step-1 event, then step 3 after that, etc. Strictly
    * sequential semantics (a purchase before the first view does not
    * count) via layered per-user window minima — one shuffle on the user
    * key total, no self-joins, no per-step passes over the events: step
    * k's qualifying timestamp is min(ts | type=step_k ∧ ts > t_{k-1})
    * computed inside the SAME user partition.
    *
    * Returns one row per step with distinct-user counts, conversion from
    * the previous step, and conversion from the top (exact integer
    * divisions).
    *
    * @param within optional conversion window (e.g. "7 days"); `anchor`
    *   decides what it is measured from.
    * @param anchor [[AnchorFirst]] (default) bounds every step against the
    *   first step-1 event; [[AnchorPrevStep]] bounds each step against the
    *   previous step's qualifying event. Identical for 2-step funnels;
    *   from step 3 on, prev-step is the more permissive semantics.
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, steps: Seq[String],
             within: Option[String] = None,
             anchor: ConversionAnchor = AnchorFirst): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size, s"duplicate funnel steps: $steps")
    val w = Window.partitionBy(col(userCol))
    // _t0 = first step-0 event; _tk = first step-k event after _t(k-1)
    val withTimes = steps.zipWithIndex.foldLeft(events) { case (df, (step, i)) =>
      val inWindow = within match {
        case Some(iv) if i > 0 =>
          val base = anchor match {
            case AnchorFirst => col("_t0")
            case AnchorPrevStep => col(s"_t${i - 1}")
          }
          col(tsCol) <= base + expr(s"INTERVAL $iv")
        case _ => lit(true)
      }
      val qualifies = col(typeCol) === step &&
        (if (i == 0) lit(true) else col(s"_t${i - 1}").isNotNull &&
          col(tsCol) > col(s"_t${i - 1}") && inWindow)
      df.withColumn(s"_t$i", min(when(qualifies, col(tsCol))).over(w))
    }
    val perUser = withTimes
      .groupBy(col(userCol))
      .agg(steps.indices.map(i => max(col(s"_t$i")).as(s"_t$i")).head,
        steps.indices.map(i => max(col(s"_t$i")).as(s"_t$i")).tail: _*)
    val counts = perUser.agg(
      steps.indices.map(i =>
        count(col(s"_t$i")).as(s"n$i")).head,
      steps.indices.map(i => count(col(s"_t$i")).as(s"n$i")).tail: _*)
    val stepRows = steps.zipWithIndex.map { case (step, i) =>
      struct(lit(i + 1).as("step"), lit(step).as("event_type"),
        col(s"n$i").as("n_users"),
        (col(s"n$i").cast("double") /
          when(col(if (i == 0) "n0" else s"n${i - 1}") =!= 0,
            col(if (i == 0) "n0" else s"n${i - 1}"))).as("conv_from_prev"),
        (col(s"n$i").cast("double") / when(col("n0") =!= 0, col("n0")))
          .as("conv_from_top"))
    }
    counts.select(explode(array(stepRows: _*)).as("s")).select(col("s.*"))
  }

  /** Weekly cohort retention: users bucketed by the ISO week of their
    * first event; for each (cohort week, week offset) the number of
    * cohort members active that week and the retention rate. Two
    * aggregations — distinct (user, week) activity, then the cohort
    * rollup — both shuffling progressively smaller data.
    */
  def cohortRetention(events: DataFrame, userCol: String,
                      tsCol: String): DataFrame = {
    val weekly = events
      .select(col(userCol), date_trunc("week", col(tsCol)).cast("date").as("week"))
      .distinct()
    val w = Window.partitionBy(col(userCol))
    val withCohort = weekly.withColumn("cohort_week", min(col("week")).over(w))
    val sized = withCohort
      .groupBy(col("cohort_week"),
        (datediff(col("week"), col("cohort_week")) / 7).cast("int").as("week_offset"))
      .agg(countDistinct(col(userCol)).as("n_active"))
    val cohortSizes = sized.where(col("week_offset") === 0)
      .select(col("cohort_week").as("cw"), col("n_active").as("cohort_size"))
    sized.join(broadcast(cohortSizes), col("cohort_week") === col("cw"))
      .select(col("cohort_week"), col("week_offset"), col("n_active"),
        col("cohort_size"),
        (col("n_active").cast("double") / col("cohort_size")).as("retention"))
  }
}
