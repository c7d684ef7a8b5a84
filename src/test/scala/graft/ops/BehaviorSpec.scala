package graft.ops

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** X113/X114 — funnel conversion and cohort retention: hand-computed
  * ordering/horizon semantics and the retention matrix on a tiny
  * fixture where every number is checkable by eye.
  */
class BehaviorSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String): Timestamp = Timestamp.valueOf(s)

  test("funnel: strict ordering, first occurrences, horizon cut") {
    val rows = Seq(
      // u1 converts fully: view 10:00, click 10:05, purchase 10:20
      (1L, "view", t("2024-01-01 10:00:00")),
      (1L, "click", t("2024-01-01 10:05:00")),
      (1L, "purchase", t("2024-01-01 10:20:00")),
      // u2: click BEFORE first view → not a conversion; no click after
      (2L, "click", t("2024-01-01 09:00:00")),
      (2L, "view", t("2024-01-01 09:30:00")),
      // u3: view then click outside the 1h horizon
      (3L, "view", t("2024-01-01 08:00:00")),
      (3L, "click", t("2024-01-01 09:30:00")),
      // u4: full chain but purchase lands past horizon from START
      (4L, "view", t("2024-01-01 12:00:00")),
      (4L, "click", t("2024-01-01 12:30:00")),
      (4L, "purchase", t("2024-01-01 13:30:00")),
      // noise: never viewed
      (5L, "purchase", t("2024-01-01 10:00:00")))
      .toDF("user_id", "event_type", "ts")
    val out = Behavior.funnel(rows, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase"), horizonSec = 3600L)
      .orderBy("step_idx").collect()
    assert(out.map(r => (r.getString(1), r.getLong(2))).toSeq ===
      Seq(("view", 4L), ("click", 2L), ("purchase", 1L)))
    // avg seconds from start: view = 0; click = (300 + 1800)/2; purchase = 1200
    assert(out(0).getDouble(3) === 0.0)
    assert(out(1).getDouble(3) === 1050.0)
    assert(out(2).getDouble(3) === 1200.0)
  }

  test("funnel: later step must be strictly after the previous, not just after entry") {
    // u1: purchase sits between view and click — wrong order, no conversion
    val rows = Seq(
      (1L, "view", t("2024-01-01 10:00:00")),
      (1L, "purchase", t("2024-01-01 10:02:00")),
      (1L, "click", t("2024-01-01 10:04:00")))
      .toDF("user_id", "event_type", "ts")
    val out = Behavior.funnel(rows, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase"), horizonSec = 3600L)
      .orderBy("step_idx").collect()
    assert(out.map(_.getLong(2)).toSeq === Seq(1L, 1L, 0L))
  }

  test("transitions: per-user consecutive pairs, no cross-user pair, pinned tie order") {
    val rows = Seq(
      // u1: view -> click -> view  (ties broken by event_id)
      (1L, 10L, "view", t("2024-01-01 10:00:00")),
      (1L, 11L, "click", t("2024-01-01 10:05:00")),
      (1L, 12L, "view", t("2024-01-01 10:05:00")), // same ts as 11: id orders it after
      // u2: single event — no pair; and must NOT chain onto u1
      (2L, 13L, "purchase", t("2024-01-01 10:06:00")))
      .toDF("user_id", "event_id", "event_type", "ts")
    val out = Behavior.transitions(rows, "user_id", "event_type", "ts",
      "event_id").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out.size === 2)
    assert(out(("view", "click")) === ((1L, 1L, 1.0)))
    assert(out(("click", "view")) === ((1L, 1L, 1.0)))
  }

  test("rfmSegments: pinned ntile quartiles and exact segment means on a hand fixture") {
    // 8 users; user i has i events at value 10·i, last seen at hour i —
    // all three metrics share the same user order, so tiles align:
    // users {1,2}→tile1, {3,4}→2, {5,6}→3, {7,8}→4 on every dimension
    val rows = (1 to 8).flatMap { i =>
      (1 to i).map(j => (i.toLong, t(f"2024-01-01 $i%02d:00:00"), 10.0 * i))
    }.toDF("user_id", "ts", "value")
    val out = Behavior.rfmSegments(rows, "user_id", "ts", "value")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) ->
        (r.getLong(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(out.size === 4)
    // tile 1 = users 1,2: monetary sums 10·1·1=10 and 10·2·2=40 → avg 25;
    // frequency avg 1.5
    assert(out((1, 1, 1)) === ((2L, 25.0, 1.5)))
    // tile 4 = users 7,8: sums 490 and 640 → avg 565; freq avg 7.5
    assert(out((4, 4, 4)) === ((2L, 565.0, 7.5)))
  }

  test("cohortRetention: offsets, sizes, and rates on a hand fixture") {
    val rows = Seq(
      // cohort 2024-01-01: u1 (returns day+1, day+2), u2 (returns day+2)
      (1L, t("2024-01-01 10:00:00")), (1L, t("2024-01-02 10:00:00")),
      (1L, t("2024-01-03 10:00:00")),
      (2L, t("2024-01-01 11:00:00")), (2L, t("2024-01-03 09:00:00")),
      // duplicate same-day activity collapses
      (2L, t("2024-01-01 23:00:00")),
      // cohort 2024-01-02: u3 never returns
      (3L, t("2024-01-02 08:00:00")))
      .toDF("user_id", "ts")
    val out = Behavior.cohortRetention(rows, "user_id", "ts")
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out(("2024-01-01", 0L)) === ((2L, 2L, 1.0)))
    assert(out(("2024-01-01", 1L)) === ((1L, 2L, 0.5)))
    assert(out(("2024-01-01", 2L)) === ((2L, 2L, 1.0)))
    assert(out(("2024-01-02", 0L)) === ((1L, 1L, 1.0)))
    assert(out.size === 4)
  }
}
