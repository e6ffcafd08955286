package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.clean.Cleaning
import graft.ops.Relational

/** Property tests (SURVEY.md §5.3): algebraic laws over generated data.
  * ScalaCheck generators are sampled deterministically (fixed seed, no
  * scalatest bridge in the offline dep set); sizes stay small — each case
  * is a Spark job, the point is law coverage, not volume.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int = 10): Seq[A] =
    (0 until n).flatMap(i =>
      g(Gen.Parameters.default.withSize(20), Seed(42L + i)))

  private val rows = Gen.listOf(Gen.zip(Gen.chooseNum(0, 5), Gen.alphaStr.map(_.take(4))))

  test("dedup: |distinct| <= |input| and idempotent") {
    samples(rows).foreach { xs =>
      val d = Cleaning.dedup(xs.toDF("k", "v"))
      val n = d.count()
      n should be <= xs.size.toLong
      Cleaning.dedup(d).count() shouldBe n
    }
  }

  test("union row-count additivity") {
    samples(Gen.zip(rows, rows)).foreach { case (a, b) =>
      a.toDF("k", "v").union(b.toDF("k", "v")).count() shouldBe
        (a.size + b.size).toLong
    }
  }

  test("dsum is invariant under repartitioning") {
    samples(Gen.nonEmptyListOf(Gen.chooseNum(-1000, 1000).map(_ / 7.0)))
      .foreach { xs =>
        val df = xs.toDF("x")
        val s1 = df.select(Relational.dsum($"x", 6)).as[Double].head()
        val s2 = df.repartition(5).select(Relational.dsum($"x", 6)).as[Double].head()
        s1 shouldBe s2
      }
  }

  test("decade: always <year-floor>s") {
    samples(Gen.chooseNum(1000, 2999), 20).foreach { y =>
      val d = Seq(y).toDF("year").select(Relational.decade($"year")).as[String].head()
      d shouldBe s"${y / 10 * 10}s"
    }
  }

  test("upsert is idempotent: applying the same source twice equals once") {
    import graft.versioned.VersionedTable
    samples(Gen.chooseNum(1, 8), 3).foreach { n =>
      val t = VersionedTable.create(spark, tmpDir("vt-idem"),
        (1L to 20L).map(i => (i, s"v$i")).toDF("k", "v"))
      val source = (1L to n.toLong).map(i => (i * 3, s"u$i")).toDF("k", "v")
      t.upsert(source, keys = Seq("k"))
      val once = t.toDF.orderBy("k").collect().toSeq
      t.upsert(source, keys = Seq("k"))
      t.toDF.orderBy("k").collect().toSeq shouldBe once
    }
  }

  test("HLL registers agree with a driver-side reference implementation") {
    import graft.sketch.Hll
    val keys = samples(Gen.chooseNum(0L, 100000L), 300).distinct
    val df = keys.toDF("k")
    val got = Hll.registers(df, $"k", p = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reference: same md5-derivation computed in plain Scala
    val expected = keys
      .map { k =>
        val hex = org.apache.commons.codec.digest.DigestUtils
          .md5Hex(String.valueOf(k).getBytes("UTF-8")).take(12)
        java.lang.Long.parseLong(hex, 16)
      }
      .map { h =>
        val bucket = h & 63L
        val w = h >> 6
        val rho = if (w == 0) 43L
          else java.lang.Long.numberOfTrailingZeros(w) + 1L
        bucket -> rho
      }
      .groupBy(_._1).map { case (b, rs) => b -> rs.map(_._2).max }
    got shouldBe expected
  }

  test("unpivot then pivot round-trips a wide frame") {
    val wide = Gen.nonEmptyListOf(Gen.zip(
      Gen.identifier.map("k" + _.take(3)), Gen.chooseNum(0, 99), Gen.chooseNum(0, 99)))
    samples(wide, 5).foreach { xs =>
      val unique = xs.distinctBy(_._1)
      val df = unique.toDF("id", "a", "b")
      val long = df.unpivot(Array($"id"), Array($"a", $"b"), "var", "val")
      long.count() shouldBe unique.size * 2L
      val back = long.groupBy("id").pivot("var", Seq("a", "b")).agg(first($"val"))
      back.count() shouldBe unique.size.toLong
      back.select("id", "a", "b").except(df).count() shouldBe 0L
    }
  }

  test("skyline: survivors undominated, non-survivors dominated") {
    val pts = Gen.nonEmptyListOf(
      Gen.zip(Gen.chooseNum(0, 20), Gen.chooseNum(0, 20)))
    samples(pts, 8).foreach { xs =>
      val ids = xs.zipWithIndex.map { case ((p, s), i) => (i.toLong, p.toDouble, s) }
      val sky = graft.ops.Skyline.pareto(ids.toDF("id", "mn", "mx"),
          col("mn"), col("mx"))
        .collect().map(_.getLong(0)).toSet
      def dominated(a: (Long, Double, Int)) = ids.exists { b =>
        b._2 <= a._2 && b._3 >= a._3 && (b._2 < a._2 || b._3 > a._3)
      }
      ids.foreach { p =>
        if (sky(p._1)) dominated(p) shouldBe false
        else dominated(p) shouldBe true
      }
    }
  }

  test("ewma stays within the min/max of its window") {
    val series = Gen.nonEmptyListOf(Gen.chooseNum(0, 10000).map(_ / 10.0))
    samples(series, 5).foreach { xs =>
      val daily = xs.take(25).zipWithIndex.map { case (v, i) =>
        (1L, java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i)), v)
      }
      val out = graft.ops.TimeSeries.ewma(daily.toDF("k", "d", "x"),
          col("k"), col("d"), col("x"))
        .collect().map(_.getDouble(2))
      val (lo, hi) = (daily.map(_._3).min, daily.map(_._3).max)
      out.foreach { e =>
        e should be >= lo - 1e-4
        e should be <= hi + 1e-4
      }
    }
  }

  test("fuzzy pairs are within the distance cap and symmetric-complete") {
    val names = Gen.nonEmptyListOf(
      Gen.oneOf("cat", "cats", "bat", "bats", "dog", "dig", "dodge", "cart"))
    samples(names, 5).foreach { xs =>
      val pairs = graft.dedup.Fuzzy.matchPairs(xs.toDF("name"), col("name"), 2)
        .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
      pairs.foreach { case (a, b, d) =>
        a should be < b
        d should (be >= 1 and be <= 2)
      }
      pairs.map(p => (p._1, p._2)).distinct.length shouldBe pairs.length
    }
  }

  test("bootstrap weight frequencies follow Poisson(1) within tolerance") {
    val df = (1 to 5000).map(i => i.toString).toDF("rk")
    val freq = df.select(graft.ops.Bootstrap.weight(col("rk"), lit(7)).as("w"))
      .groupBy("w").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    // P(0) = P(1) = e^-1 ~ .368: expect ~1839 each, sd ~ 34
    freq(0).toDouble shouldBe 1839.0 +- 150.0
    freq(1).toDouble shouldBe 1839.0 +- 150.0
    freq.getOrElse(2, 0L).toDouble shouldBe 920.0 +- 120.0
  }

  test("consistent-hash reshard moves keys only TO the new shard") {
    // v8's vnodes are a subset of v9's, so growing 8 -> 9 may only
    // re-home keys captured by shard 8's new vnodes — the defining
    // consistent-hashing property (mod sharding breaks it completely)
    import graft.ops.Sharding
    val keys = spark.range(1, 400).toDF("k")
    val j = Sharding.ringAssign(keys, col("k"), 8, 4)
      .withColumnRenamed("shard", "s_old")
      .join(Sharding.ringAssign(keys, col("k"), 9, 4)
        .withColumnRenamed("shard", "s_new"), "key")
    j.count() shouldBe 399L
    j.where(col("s_old") =!= col("s_new") && col("s_new") =!= 8)
      .count() shouldBe 0L
    j.where(col("s_new") === 8).count() should be >= 1L
  }

  test("intervalCoverage agrees with a driver-side sweep-line reference") {
    val ivGen = Gen.listOf(Gen.zip(
      Gen.chooseNum(0, 2),            // key
      Gen.chooseNum(0L, 100L),        // start
      Gen.chooseNum(0L, 30L)))        // length
    samples(ivGen, 8).filter(_.nonEmpty).foreach { xs =>
      val rows = xs.zipWithIndex.map { case ((k, s, len), i) =>
        (k, s, s + len, i.toLong)
      }
      val out = graft.ops.TimeSeries.intervalCoverage(
          rows.toDF("k", "s", "e", "id"),
          col("k"), col("s"), col("e"), col("id"))
        .collect()
        .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
        .toMap
      val ref = rows.groupBy(_._1).map { case (k, iv) =>
        val sorted = iv.map(t => (t._2, t._3)).sortBy(identity)
        // sweep: merge overlapping/touching, sum merged lengths
        val merged = sorted.foldLeft(List.empty[(Long, Long)]) {
          case (Nil, (s, e)) => List((s, e))
          case ((ms, me) :: rest, (s, e)) =>
            if (s <= me) (ms, math.max(me, e)) :: rest
            else (s, e) :: (ms, me) :: rest
        }
        k -> ((iv.size.toLong, merged.size.toLong,
          merged.map { case (s, e) => e - s }.sum))
      }
      out shouldBe ref
    }
  }

  test("weightedMedian agrees with a driver-side cumulative scan") {
    val rowGen = Gen.nonEmptyListOf(Gen.zip(
      Gen.chooseNum(0, 2),                       // key
      Gen.chooseNum(0, 50).map(_ / 4.0),         // value
      Gen.chooseNum(1L, 9L)))                    // weight
    samples(rowGen, 8).foreach { xs =>
      val rows = xs.zipWithIndex.map { case ((k, v, w), i) => (k, v, w, i.toLong) }
      val out = graft.ops.Percentiles.weightedMedian(
          rows.toDF("k", "v", "w", "id"),
          Seq("k"), col("v"), col("w"), Seq(col("id")))
        .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2)))
        .toMap
      val ref = rows.groupBy(_._1).map { case (k, g) =>
        val sorted = g.map(t => (t._2, t._4, t._3)).sortBy(t => (t._1, t._2))
        val total = g.map(_._3).sum
        val cum = sorted.scanLeft(0L)(_ + _._3).tail
        val idx = cum.indexWhere(_ * 2 >= total)
        k -> ((total, sorted(idx)._1))
      }
      out shouldBe ref
    }
  }
}
