package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Snapshot/time-bucket expressions.
  *
  * The reference assigns every observation to a 15-minute snapshot slot by
  * *nearest* slot, not floor (reference: scripts/get_raw_data/
  * get_raw_streams_data.py:34-48, a linear argmin over the 96-row
  * time-of-day dim), with a day-rollover rule when 23:52.5+ rounds up to
  * 00:00 of the next day (reference: src/get_raw_data/
  * get_raw_category_data.py:57-83).
  *
  * Here the whole lookup collapses to O(1) arithmetic on the event time —
  * no dim scan, no join, fully codegen'd — and the rollover falls out of
  * the arithmetic for free: rounding the epoch to the nearest 900s grid
  * point naturally lands in the next day when appropriate.
  */
object TimeFns {

  /** Epoch seconds of the *nearest* 15-minute grid point.
    *
    * floor((epoch + 450) / 900) * 900 — "round half up" on a 900s grid.
    * Integer arithmetic only, so it is exact and engine-portable.
    */
  def nearestSlotEpoch(ts: Column): Column =
    floor((unix_timestamp(ts) + 450L) / 900L) * 900L

  /** Snapshot day key `yyyyMMdd` (reference `day_date_id`). */
  def snapshotDayId(ts: Column): Column =
    date_format(timestamp_seconds(nearestSlotEpoch(ts)), "yyyyMMdd")

  /** Snapshot time-of-day key `HHmm` (reference `time_of_day_id`). */
  def snapshotTimeId(ts: Column): Column =
    date_format(timestamp_seconds(nearestSlotEpoch(ts)), "HHmm")

  /** Floor-aligned tumbling-window start (epoch seconds), for standard
    * streaming windows where floor semantics are wanted instead of nearest.
    */
  def tumblingStartEpoch(ts: Column, seconds: Long): Column =
    floor(unix_timestamp(ts) / seconds) * seconds

  /** `part_of_day` bucket used by the reference time dim (reference:
    * scripts/get_raw_data/get_raw_time_of_day_data.py:78-81 — the slot
    * list is 20x night + 28x morning + 20x afternoon + 16x evening +
    * 12x night, i.e. night [21,5), morning [5,12), afternoon [12,17),
    * evening [17,21); verified against raw_time_of_day_data.csv).
    */
  def partOfDay(hour: Column): Column =
    when(hour < 5, "night")
      .when(hour < 12, "morning")
      .when(hour < 17, "afternoon")
      .when(hour < 21, "evening")
      .otherwise("night")
}
