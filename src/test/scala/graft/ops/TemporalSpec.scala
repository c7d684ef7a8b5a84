package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** As-of join + bucketed interval join: semantics pinned on handwritten
  * fixtures, including the edge cases the operators guard (numeric
  * tie-break, null timestamps, inverted/null window bounds, reserved
  * internal column names).
  */
class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def asofFixture = {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100),
      (1L, ts("2024-01-01 12:00:00"), 101),
      (2L, ts("2024-01-01 11:00:00"), 200),
      (3L, ts("2024-01-01 11:00:00"), 300) // key with no right rows
    ).toDF("k", "t", "lv")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), 5L, 0.9),
      (1L, ts("2024-01-01 11:30:00"), 6L, 1.1),
      (2L, ts("2024-01-01 11:00:00"), 7L, 2.0) // equal ts: <= must match
    ).toDF("k", "t", "tie", "rv")
    (left, right)
  }

  test("asofJoin attaches the latest right row at-or-before each left row") {
    val (left, right) = asofFixture
    val out = Temporal
      .asofJoin(left, right, "k", "t", "t", "tie", Seq("rv" -> "last_rv"))
      .orderBy("k", "t")
      .select($"k", $"lv", $"last_rv").as[(Long, Int, Option[Double])]
      .collect().toSeq
    assert(out === Seq(
      (1L, 100, Some(0.9)),  // 10:00 sees the 09:00 row, not 11:30
      (1L, 101, Some(1.1)),  // 12:00 sees 11:30
      (2L, 200, Some(2.0)),  // equal timestamps match (<=)
      (3L, 300, None)))      // LEFT semantics: kept with null payload
  }

  test("asofJoin breaks timestamp ties on the tie column's NATIVE order") {
    // two right rows at the same instant with tie ids 9 and 10: numeric
    // order picks 10; the old string-cast order picked '9' > '10'
    val left = Seq((1L, ts("2024-01-01 10:00:00"))).toDF("k", "t")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), 9L, "nine"),
      (1L, ts("2024-01-01 09:00:00"), 10L, "ten")
    ).toDF("k", "t", "tie", "tag")
    val got = Temporal
      .asofJoin(left, right, "k", "t", "t", "tie", Seq("tag" -> "won"))
      .select($"won").as[String].head()
    assert(got === "ten")
  }

  test("asofJoin drops null-timestamp right rows instead of mis-attaching") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"), 1)).toDF("k", "t", "lv")
    val right = Seq(
      (1L, Option.empty[java.sql.Timestamp], 1L, 111.0)
    ).toDF("k", "t", "tie", "rv")
    val out = Temporal
      .asofJoin(left, right, "k", "t", "t", "tie", Seq("rv" -> "last_rv"))
      .select($"last_rv").as[Option[Double]].collect().toSeq
    // the null-ts right row is not "before" anything — no payload attaches
    assert(out === Seq(None))
  }

  test("asofJoin never matches across null keys (SQL equality semantics)") {
    // a window partition groups null keys TOGETHER; SQL's l.k = r.k never
    // matches them — both forms must side with SQL (the oracle replay)
    val left = Seq(
      (Option(1L), ts("2024-01-01 10:00:00"), 1),
      (Option.empty[Long], ts("2024-01-01 10:00:00"), 2)
    ).toDF("k", "t", "lv")
    val right = Seq(
      (Option.empty[Long], ts("2024-01-01 09:00:00"), 1L, 9.0)
    ).toDF("k", "t", "tie", "rv")
    for (out <- Seq(
        Temporal.asofJoin(left, right, "k", "t", "t", "tie",
          Seq("rv" -> "last_rv")),
        Temporal.asofJoinSharded(left, right, "k", "t", "t", "tie",
          Seq("rv" -> "last_rv"), bucketSec = 3600))) {
      val got = out.orderBy("lv")
        .select($"lv", $"last_rv").as[(Int, Option[Double])].collect().toSeq
      assert(got === Seq((1, None), (2, None)))
    }
  }

  test("asofJoin rejects reserved __ input column names") {
    val (left, right) = asofFixture
    val ex = intercept[IllegalArgumentException] {
      Temporal.asofJoin(left.withColumnRenamed("lv", "__tie"), right,
        "k", "t", "t", "tie", Seq("rv" -> "last_rv"))
    }
    assert(ex.getMessage.contains("__"))
  }

  test("asofJoinSharded is row-identical to asofJoin on the edge fixture") {
    val (left, right) = asofFixture
    // bucket narrower than the data span so real boundary stitches occur
    for (bucketSec <- Seq(600L, 3600L, 86400L)) {
      val plain = Temporal.asofJoin(left, right, "k", "t", "t", "tie",
        Seq("rv" -> "last_rv", "tie" -> "last_tie"))
      val sharded = Temporal.asofJoinSharded(left, right, "k", "t", "t",
        "tie", Seq("rv" -> "last_rv", "tie" -> "last_tie"), bucketSec)
      assert(sharded.exceptAll(plain).isEmpty &&
        plain.exceptAll(sharded).isEmpty, s"bucketSec=$bucketSec")
    }
  }

  test("asofJoinSharded stitches a hot key across many buckets like the plain form") {
    // ONE key, interleaved rows spread over ~100 buckets at 600 s, with
    // deliberate ts collisions (both right-right and left-right) so the
    // tie and tag orders are exercised across the seed boundary
    val base = ts("2024-01-01 00:00:00").getTime
    val left = (0 until 400).map { i =>
      (1L, new java.sql.Timestamp(base + (i * 137L % 60000) * 1000L), i)
    }.toDF("k", "t", "lv")
    val right = (0 until 300).map { i =>
      (1L, new java.sql.Timestamp(base + (i * 211L % 60000) * 1000L),
        i.toLong, i * 0.5)
    }.toDF("k", "t", "tie", "rv")
    val plain = Temporal.asofJoin(left, right, "k", "t", "t", "tie",
      Seq("rv" -> "last_rv"))
    val sharded = Temporal.asofJoinSharded(left, right, "k", "t", "t",
      "tie", Seq("rv" -> "last_rv"), bucketSec = 600)
    assert(sharded.exceptAll(plain).isEmpty &&
      plain.exceptAll(sharded).isEmpty)
  }

  test("asofJoinSharded keeps null-timestamp left rows unmatched") {
    val left = Seq(
      (1L, Option(ts("2024-01-01 10:00:00")), 1),
      (1L, Option.empty[java.sql.Timestamp], 2)
    ).toDF("k", "t", "lv")
    val right = Seq((1L, ts("2024-01-01 09:00:00"), 1L, 9.0))
      .toDF("k", "t", "tie", "rv")
    val out = Temporal.asofJoinSharded(left, right, "k", "t", "t", "tie",
        Seq("rv" -> "last_rv"), bucketSec = 3600)
      .orderBy("lv")
      .select($"lv", $"last_rv").as[(Int, Option[Double])].collect().toSeq
    assert(out === Seq((1, Some(9.0)), (2, None)))
  }

  test("asofEnrichStreamStatic matches asofJoin on a batch frame") {
    val (left, right) = asofFixture
    val plain = Temporal.asofJoin(left, right, "k", "t", "t", "tie",
      Seq("rv" -> "last_rv"))
    val enriched = Temporal.asofEnrichStreamStatic(left, right, "k", "t",
      "t", "tie", Seq("rv" -> "last_rv"))
    assert(enriched.exceptAll(plain).isEmpty &&
      plain.exceptAll(enriched).isEmpty)
  }

  test("asofEnrichStreamStatic rejects a map payload with a named error") {
    val (left, right) = asofFixture
    val withMap = right.withColumn("attrs", map(lit("a"), col("rv")))
    val e = intercept[IllegalArgumentException] {
      Temporal.asofEnrichStreamStatic(left, withMap, "k", "t", "t", "tie",
        Seq("attrs" -> "last_attrs"))
    }
    assert(e.getMessage.contains("attrs") && e.getMessage.contains("map"))
  }

  test("asofEnrichStreamStatic enriches a real stream with point-in-time state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), 1L, 0.9),
      (1L, ts("2024-01-01 11:00:00"), 2L, 1.1)
    ).toDF("k", "t", "tie", "rv")
    val in = MemoryStream[(Long, java.sql.Timestamp)]
    val out = Temporal.asofEnrichStreamStatic(
      in.toDF().toDF("k", "t"), right, "k", "t", "t", "tie",
      Seq("rv" -> "last_rv"))
    val q = out.writeStream.format("memory").queryName("asof_enrich")
      .outputMode("append").start()
    try {
      in.addData((1L, ts("2024-01-01 10:00:00")),
        (1L, ts("2024-01-01 12:00:00")), (2L, ts("2024-01-01 12:00:00")))
      q.processAllAvailable()
      val got = spark.table("asof_enrich")
        .orderBy("t", "k")
        .select($"k", $"last_rv").as[(Long, Option[Double])]
        .collect().toSeq
      assert(got === Seq(
        (1L, Some(0.9)),  // 10:00 sees the 09:00 state only
        (1L, Some(1.1)),  // 12:00 sees the 11:00 update
        (2L, None)))      // no timeline for key 2
    } finally q.stop()
  }

  private def windowsFixture = Seq(
    (10L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")), // 2 events
    (11L, ts("2024-01-01 12:00:00"), ts("2024-01-01 12:30:00")), // 0 events
    (12L, ts("2024-01-01 11:00:00"), ts("2024-01-01 10:00:00")), // inverted
    (13L, null.asInstanceOf[java.sql.Timestamp], ts("2024-01-01 11:00:00"))
  ).toDF("id", "s", "e")

  private def eventsFixture = Seq(
    (ts("2024-01-01 10:00:00"), 1.0), // == start: included (half-open)
    (ts("2024-01-01 10:59:59"), 3.0),
    (ts("2024-01-01 11:00:00"), 9.0)  // == end: excluded
  ).toDF("et", "ev")

  test("intervalJoinBucketed: containment counts, zero/invalid windows kept") {
    val out = Temporal
      .intervalJoinBucketed(windowsFixture, "id", "s", "e",
        eventsFixture, "et", "ev", bucketSec = 600)
      .orderBy("id")
      .select($"id", $"n_events", $"avg_value")
      .as[(Long, Long, Option[Double])].collect().toSeq
    assert(out === Seq(
      (10L, 2L, Some(2.0)), // [10:00, 11:00): 10:00 in, 11:00 out
      (11L, 0L, None),      // zero-event window kept (LEFT semantics)
      (12L, 0L, None),      // inverted bounds: kept, matches nothing
      (13L, 0L, None)))     // null start: kept, matches nothing
  }

  test("tuneBucketSec picks the median window length, ignoring invalid windows") {
    // the hot-range posture fixture shape: one-minute windows — the
    // tuned pick must be the 60 s cell that measured the 6.9x speedup
    // over the coarse single-cell plan (POSTURE_10X interval section)
    val oneMinute = (0 until 100).map(i =>
      (i.toLong, ts(f"2024-01-01 10:${i / 60}%02d:${i % 60}%02d"),
        ts(f"2024-01-01 10:${(i + 60) / 60}%02d:${(i + 60) % 60}%02d")))
      .toDF("id", "s", "e")
    assert(Temporal.tuneBucketSec(oneMinute, "s", "e") === 60L)

    // median, not mean: one huge window must not drag the cell size up
    val mixed = Seq(
      (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:00:10")), // 10 s
      (2L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:00:20")), // 20 s
      (3L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"))  // 1 h
    ).toDF("id", "s", "e")
    assert(Temporal.tuneBucketSec(mixed, "s", "e") === 20L)

    // inverted/null windows are excluded from the tuning population, and
    // a population of ONLY those fails loudly rather than guessing
    assert(Temporal.tuneBucketSec(
      windowsFixture.filter($"id" === 10L || $"id" === 12L || $"id" === 13L),
      "s", "e") === 3600L)
    assertThrows[IllegalArgumentException] {
      Temporal.tuneBucketSec(windowsFixture.filter($"id" >= 12L), "s", "e")
    }
  }

  test("intervalJoinBucketed bounds the explode for inverted windows") {
    // a year-long inversion would explode into ~52k cells unguarded; the
    // PRODUCTION guard (windowCells — the operator's explode input) must
    // return null for it, i.e. ONE carrier row after explode_outer
    val cells = Seq(
      (1L, ts("2025-01-01 00:00:00"), ts("2024-01-01 00:00:00")), // inverted
      (2L, ts("2024-01-01 00:00:00"), ts("2024-01-01 01:00:00"))  // 1 h
    ).toDF("id", "s", "e")
      .select($"id", Temporal.windowCells($"s", $"e", 600).as("c"))
      .orderBy("id")
      .as[(Long, Option[Seq[Long]])].collect().toSeq
    assert(cells(0)._2.isEmpty)          // inverted: null, never a sequence
    assert(cells(1)._2.get.length === 6) // valid hour at 600 s: 6 cells
  }

  test("intervalJoinBucketedKeyed collects only same-key events per window") {
    val wins = Seq(
      (Option(1L), 10L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")),
      (Option(2L), 11L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")),
      (Option.empty[Long], 12L,
        ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"))
    ).toDF("k", "id", "s", "e")
    val evs = Seq(
      (Option(1L), ts("2024-01-01 10:30:00"), 1.0),
      (Option(1L), ts("2024-01-01 10:45:00"), 3.0),
      (Option(2L), ts("2024-01-01 10:30:00"), 9.0),
      (Option.empty[Long], ts("2024-01-01 10:30:00"), 99.0) // matches nothing
    ).toDF("k", "et", "ev")
    val out = Temporal.intervalJoinBucketedKeyed(wins, "k", "id", "s", "e",
        evs, "k", "et", "ev", bucketSec = 600)
      .orderBy("id")
      .select($"id", $"n_events", $"avg_value")
      .as[(Long, Long, Option[Double])].collect().toSeq
    assert(out === Seq(
      (10L, 2L, Some(2.0)),  // key 1's two events only
      (11L, 1L, Some(9.0)),  // key 2's event only
      (12L, 0L, None)))      // null key: kept, matches nothing
  }

  test("intervalJoinBucketedKeyed ≡ unkeyed on single-key data") {
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("one", lit(1L))
    val wins = ev.filter($"event_type" === "signup")
      .select($"one", $"event_id".as("id"), $"ts".as("s"),
        ($"ts" + expr("INTERVAL 30 MINUTE")).as("e"))
    val ev2 = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("one", lit(1L))
    val keyed = Temporal.intervalJoinBucketedKeyed(wins, "one", "id", "s",
        "e", ev2, "one", "ts", "value", 1800)
      .drop("one")
    val unkeyed = Temporal.intervalJoinBucketed(wins.drop("one"), "id",
      "s", "e", ev2, "ts", "value", 1800)
    assert(keyed.exceptAll(unkeyed).isEmpty &&
      unkeyed.exceptAll(keyed).isEmpty)
  }

  test("intervalJoinBucketed agrees with the naive theta-join on events") {
    // cross-check the rewrite against the obviously-correct plan on the
    // driver fixture: signup windows vs all events
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    val wins = ev.filter($"event_type" === "signup")
      .select($"event_id".as("id"), $"ts".as("s"),
        ($"ts" + expr("INTERVAL 30 MINUTE")).as("e"))
    val fast = Temporal
      .intervalJoinBucketed(wins, "id", "s", "e", ev, "ts", "value", 1800)
    // fresh read for the naive side: wins derives from ev, and self-join
    // column references (ev("ts") vs wins' lineage) resolve ambiguously
    val ev2 = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    val naive = wins.join(ev2, ev2("ts") >= $"s" && ev2("ts") < $"e", "left")
      .groupBy($"id", $"s", $"e")
      .agg(count(ev2("ts")).as("n_events"),
        round(avg(ev2("value")), 6).as("avg_value"))
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
  }

  test("streamIntervalJoin matches across micro-batches and equals its batch form") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def alerts(d: DataFrame) = d.select(
      col("event_id").as("alert_id"), col("ts").as("alert_ts"),
      col("event_type"), col("value").as("alert_value"))
      .where(col("alert_value") >= 100)
    def reads(d: DataFrame) = d.select(
      col("event_id").as("reading_id"), col("ts").as("r_ts"),
      col("event_type"), col("value").as("r_value"))
    def joinOf(d: DataFrame) = Temporal.streamIntervalJoin(
      alerts(d), "alert_ts", "10 minutes",
      reads(d), "r_ts", "10 minutes",
      Seq("event_type"), windowTo = "5 minutes")
    val rows = Seq(
      (1L, ts("2024-01-01 10:00:00"), "a", 150.0), // the alert
      (2L, ts("2024-01-01 10:01:00"), "b", 10.0),  // right type? no — 'b'
      (3L, ts("2024-01-01 10:03:00"), "a", 20.0),  // in-window match
      (4L, ts("2024-01-01 10:07:00"), "a", 30.0))  // 7 min > 5: outside
    val mem = MemoryStream[(Long, java.sql.Timestamp, String, Double)]
    val q = joinOf(mem.toDF().toDF("event_id", "ts", "event_type", "value"))
      .writeStream.format("memory").queryName("ssj_spec")
      .outputMode("append").start()
    try {
      // the alert arrives ALONE in batch 1; its matches arrive in batch
      // 2 — the pair can only form if the alert waited in join state
      mem.addData(rows(0), rows(1))
      q.processAllAvailable()
      mem.addData(rows(2), rows(3))
      q.processAllAvailable()
      val got = spark.table("ssj_spec").select("alert_id", "reading_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // (1,1) is the self-match: the alert row is also a reading at
      // alert_ts, and the window is closed at both ends
      assert(got === Set((1L, 1L), (1L, 3L)))
      // the same operator over the same rows as a BATCH frame agrees
      val batch = joinOf(rows.toDF("event_id", "ts", "event_type", "value"))
        .select("alert_id", "reading_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(batch === got)
    } finally q.stop()
  }

  test("streamIntervalJoin rejects colliding ts names and empty keys") {
    val d = Seq((1L, ts("2024-01-01 10:00:00"), "a", 1.0))
      .toDF("event_id", "ts", "event_type", "value")
    val e1 = intercept[IllegalArgumentException] {
      Temporal.streamIntervalJoin(d, "ts", "1 minute", d, "ts", "1 minute",
        Seq("event_type"))
    }
    assert(e1.getMessage.contains("distinct"))
    val e2 = intercept[IllegalArgumentException] {
      Temporal.streamIntervalJoin(d, "ts", "1 minute",
        d.withColumnRenamed("ts", "ts2"), "ts2", "1 minute", Seq.empty)
    }
    assert(e2.getMessage.contains("key"))
  }
}
