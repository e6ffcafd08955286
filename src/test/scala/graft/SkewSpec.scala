package graft

import org.apache.spark.sql.functions._

import graft.io.Writers
import graft.ops.Skew

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin returns exactly the rows of the plain join on skewed data") {
    // 90% of fact rows share one hot key
    val fact = (1 to 1000).map(i => (if (i <= 900) "HOT" else s"k$i", i))
      .toDF("key", "id")
    val dim = Seq(("HOT", "hot-val"), ("k950", "v950")).toDF("key", "attr")
    val plain = fact.join(dim, Seq("key"), "inner")
      .select("key", "id", "attr")
    val salted = Skew.saltedJoin(fact, dim, "key", $"id", n = 8)
      .select("key", "id", "attr")
    salted.count() shouldBe plain.count()
    salted.except(plain).count() shouldBe 0
    plain.except(salted).count() shouldBe 0
  }

  test("salt spreads a hot key over n values deterministically") {
    val fact = (1 to 100).map(i => ("HOT", i)).toDF("key", "id")
    val salts = fact.select(Skew.salt($"id", 8).as("s"))
      .distinct().as[Int].collect().toSet
    salts.size should be > 4 // spread happened
    salts.foreach(s => s should (be >= 0 and be < 8))
    // deterministic: same input -> same salts
    val again = fact.select(Skew.salt($"id", 8).as("s"))
      .distinct().as[Int].collect().toSet
    again shouldBe salts
  }

  test("saltedGroupAgg equals the direct aggregation") {
    val df = (1 to 500).map(i => (if (i % 5 == 0) "HOT" else s"g${i % 7}", i.toLong))
      .toDF("key", "v")
    val direct = df.groupBy("key").agg(sum($"v").as("v"))
      .as[(String, Long)].collect().toMap
    val salted = Skew.saltedGroupAgg(df, "key", $"v", 8,
      partialAgg = sum, valueCol = "v", finalAgg = sum)
      .as[(String, Long)].collect().toMap
    salted shouldBe direct
  }

  test("join of two same-bucketed tables has no shuffle Exchange") {
    graft.io.Catalog.createDatabase(spark, "graft_bkt")
    val base = tmpDir("bkt")
    val a = (1 to 100).map(i => (i.toLong, s"a$i")).toDF("k", "va")
    val b = (1 to 100).map(i => (i.toLong, s"b$i")).toDF("k", "vb")
    Writers.bucketed(a, "graft_bkt.ta", s"$base/ta", Seq("k"), 4, Seq("k"))
    Writers.bucketed(b, "graft_bkt.tb", s"$base/tb", Seq("k"), 4, Seq("k"))
    // force the shuffle-based strategy (tiny test tables would otherwise
    // broadcast); bucketing must then replace the shuffle
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("graft_bkt.ta")
        .join(spark.table("graft_bkt.tb"), Seq("k"), "inner")
      joined.count() shouldBe 100
      val plan = joined.queryExecution.executedPlan.toString
      plan should include("SortMergeJoin")
      plan should not include "Exchange hashpartitioning"
      plan should include("Bucketed: true")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      graft.io.Catalog.dropDatabase(spark, "graft_bkt")
    }
  }
}
