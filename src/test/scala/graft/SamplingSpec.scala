package graft

import org.apache.spark.sql.functions._

import graft.ops.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def rows = (1L to 2000L).map(i => (i, s"payload-$i")).toDF("id", "v")

  test("hashSample is deterministic and partitioning-independent") {
    val a = Sampling.hashSample(rows, $"id", permille = 200)
      .select("id").collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(rows.repartition(7), $"id", permille = 200)
      .select("id").collect().map(_.getLong(0)).toSet
    a shouldBe b
    // Uniformity sanity: a ~20% sample of 2000 keys lands near 400.
    a.size.toDouble shouldBe 400.0 +- 80.0
  }

  test("growing the rate only adds rows (nested samples)") {
    val small = Sampling.hashSample(rows, $"id", permille = 100)
      .select("id").collect().map(_.getLong(0)).toSet
    val big = Sampling.hashSample(rows, $"id", permille = 500)
      .select("id").collect().map(_.getLong(0)).toSet
    small.subsetOf(big) shouldBe true
  }

  test("different salts draw independent samples") {
    val a = Sampling.hashSample(rows, $"id", 300, salt = "a")
      .select("id").collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(rows, $"id", 300, salt = "b")
      .select("id").collect().map(_.getLong(0)).toSet
    a should not be b
    // Independence sanity: overlap near 300/1000 * |a|, far from |a|.
    val overlap = (a intersect b).size.toDouble
    overlap shouldBe (0.3 * a.size) +- (0.15 * a.size)
  }

  test("split covers every row once, with disjoint stable assignments") {
    val s = Sampling.split(rows, $"id", trainPm = 800, valPm = 100)
    s.count() shouldBe 2000
    val bySplit = s.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    bySplit.keySet shouldBe Set("train", "val", "test")
    bySplit("train").toDouble shouldBe 1600.0 +- 150.0
    // A row's split never changes when the frame is re-partitioned.
    val s2 = Sampling.split(rows.repartition(5), $"id", trainPm = 800, valPm = 100)
    s.select("id", "split").collect().toSet shouldBe
      s2.select("id", "split").collect().toSet
  }

  test("split is monotone: growing train only promotes from later splits") {
    val s80 = Sampling.split(rows, $"id", 800, 100).where($"split" === "train")
      .select("id").collect().map(_.getLong(0)).toSet
    val s90 = Sampling.split(rows, $"id", 900, 50).where($"split" === "train")
      .select("id").collect().map(_.getLong(0)).toSet
    s80.subsetOf(s90) shouldBe true
  }

  test("stratifiedSample applies per-stratum rates off one shared bucket") {
    val strat = rows.withColumn("grp",
      when($"id" % 2 === 0, lit("even")).otherwise(lit("odd")))
    val s = Sampling.stratifiedSample(strat, $"id", $"grp",
      permille = Map("even" -> 500), defaultPm = 100)
    val byGrp = s.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    byGrp("even").toDouble shouldBe 500.0 +- 100.0 // ~50% of 1000
    byGrp("odd").toDouble shouldBe 100.0 +- 50.0   // ~10% of 1000
    // Strata draw from the same bucket assignment: the kept odd ids are a
    // subset of what a uniform 500-permille sample keeps.
    val uniform = Sampling.hashSample(rows, $"id", 500)
      .select("id").collect().map(_.getLong(0)).toSet
    s.where($"grp" === "odd").select("id").collect().map(_.getLong(0))
      .toSet.subsetOf(uniform) shouldBe true
  }

  test("mixOrder interleaves by weight: a weight-1 group runs at 2x the density of weight-0.5") {
    val docs = ((1L to 100L).map(i => (i, "en")) ++ (101L to 200L).map(i => (i, "de")))
      .toDF("id", "g")
    val mix = Sampling.mixOrder(docs, groupCol = $"g",
        weight = when($"g" === "en", 1.0).otherwise(0.5), keyCol = $"id")
      .collect().map(r => (r.getString(1), r.getDouble(2), r.getLong(3)))
    // mix_rank is a permutation of 1..200
    mix.map(_._3).sorted.toSeq shouldBe (1L to 200L)
    // schedule prefix up to pos P holds P en rows and P/2 de rows:
    // within the first 30 schedule slots, en outnumbers de 2:1
    val first30 = mix.sortBy(_._3).take(30)
    first30.count(_._1 == "en") shouldBe 20
    first30.count(_._1 == "de") shouldBe 10
    // deterministic across partitionings
    val again = Sampling.mixOrder(docs.repartition(7), groupCol = $"g",
        weight = when($"g" === "en", 1.0).otherwise(0.5), keyCol = $"id")
      .collect().map(r => (r.getString(1), r.getDouble(2), r.getLong(3)))
    again.sortBy(_._3).toSeq shouldBe mix.sortBy(_._3).toSeq
  }

  test("sample predicate stays a scan-level filter (no shuffle)") {
    val plan = Sampling.hashSample(rows, $"id", 200)
      .queryExecution.executedPlan.toString
    plan should not include "Exchange"
  }

  test("capPerGroup keeps at most cap rows per group, deterministically") {
    val docs = ((1L to 100L).map(i => (i, "en")) ++ (101L to 130L).map(i => (i, "de")))
      .toDF("id", "g")
    val capped = Sampling.capPerGroup(docs, $"g", $"id", cap = 10, salt = "s")
    val byGroup = capped.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    byGroup shouldBe Map("en" -> 10L, "de" -> 10L)
    capped.agg(max($"grp_rn")).head().getInt(0) shouldBe 10
    // same rows on a rerun with different partitioning
    val again = Sampling.capPerGroup(docs.repartition(7), $"g", $"id",
      cap = 10, salt = "s")
    again.select("id").as[Long].collect().sorted shouldBe
      capped.select("id").as[Long].collect().sorted
    // a different salt draws a different subset (statistically certain
    // for 10-of-100)
    val other = Sampling.capPerGroup(docs, $"g", $"id", cap = 10, salt = "t")
    other.select("id").as[Long].collect().sorted should not be
      capped.select("id").as[Long].collect().sorted
  }
}
