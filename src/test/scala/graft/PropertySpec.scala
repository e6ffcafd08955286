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
}
