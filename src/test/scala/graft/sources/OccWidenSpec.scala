package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** X143 lossless type widening: a metadata-only commit widens a
  * column's type, pre-widening files upcast at scan time (parquet type
  * promotion), narrower writers upcast additively, the lattice refuses
  * anything lossy, and the `type_widening` feature is stamped so old
  * readers refuse by name.
  */
class OccWidenSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("graft_widen").toString + "/t"

  test("int->long widening is metadata-only; two generations read promoted") {
    val dir = freshDir()
    val gen1 = (0 until 10).map(i => (i.toLong, i * 10))
      .toDF("id", "metric")
      .withColumn("metric", col("metric").cast("int")).coalesce(1)
    OccTable.init(gen1, dir, statsColumns = Seq("metric"))
    val filesBefore = OccTable.snapshot(spark, dir).files.toSet
    OccTable.widenColumn(spark, dir, "metric", LongType)
    val snap = OccTable.snapshot(spark, dir)
    assert(snap.files.toSet === filesBefore, "widening must rewrite nothing")
    assert(snap.features.contains("type_widening"))
    assert(snap.schema.get("metric").dataType === LongType)
    // post-widening values need the wider type
    OccTable.append((10 until 15).map(i =>
        (i.toLong, 3000000000L + i)).toDF("id", "metric").coalesce(1),
      dir, statsColumns = Seq("metric"))
    val out = OccTable.read(spark, dir)()
    assert(out.schema("metric").dataType === LongType)
    val m = out.select("id", "metric").as[(Long, Long)].collect().toMap
    assert(m(3L) === 30L && m(12L) === 3000000012L && m.size === 15)
    // stats recorded before AND after the widening still prune exactly
    val pruned = OccTable.readPruned(spark, dir, "metric",
      3000000000.0, 4000000000.0)
    assert(pruned.count() === 5L)
    assert(OccTable.pruneFileSet(spark, dir,
      OccTable.snapshot(spark, dir), Seq.empty,
      Seq(("metric", 3000000000.0, 4000000000.0)), Seq.empty).size === 1)
  }

  test("the lattice refuses lossy or narrowing changes") {
    val dir = freshDir()
    OccTable.init(Seq((1L, 2, 3.0f)).toDF("id", "i", "f"), dir)
    // long -> int narrows; long -> double loses above 2^53; float is
    // below double only
    assertThrows[IllegalArgumentException] {
      OccTable.widenColumn(spark, dir, "id", IntegerType)
    }
    assertThrows[IllegalArgumentException] {
      OccTable.widenColumn(spark, dir, "id", DoubleType)
    }
    assertThrows[IllegalArgumentException] {
      OccTable.widenColumn(spark, dir, "f", FloatType)
    }
    OccTable.widenColumn(spark, dir, "f", DoubleType)
    OccTable.widenColumn(spark, dir, "i", LongType)
    val st = OccTable.snapshot(spark, dir).schema.get
    assert(st("f").dataType === DoubleType && st("i").dataType === LongType)
  }

  test("a narrower writer upcasts additively after the widening") {
    val dir = freshDir()
    OccTable.init(Seq((1L, 10)).toDF("id", "m")
      .withColumn("m", col("m").cast("int")).coalesce(1), dir)
    OccTable.widenColumn(spark, dir, "m", LongType)
    // yesterday's producer still emits int — the write upcasts instead
    // of refusing with a type clash
    OccTable.append(Seq((2L, 20)).toDF("id", "m")
      .withColumn("m", col("m").cast("int")).coalesce(1), dir)
    val out = OccTable.read(spark, dir)().select("id", "m")
      .as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 10L, 2L -> 20L))
    // merge with a narrow source upcasts the same way
    OccTable.merge(spark, dir, Seq((2L, 99), (3L, 30)).toDF("id", "m")
      .withColumn("m", col("m").cast("int")), Seq("id"))
    val out2 = OccTable.read(spark, dir)().select("id", "m")
      .as[(Long, Long)].collect().toMap
    assert(out2 === Map(1L -> 10L, 2L -> 99L, 3L -> 30L))
  }
}
