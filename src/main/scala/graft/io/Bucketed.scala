package graft.io

import org.apache.spark.sql.SparkSession

import graft.Tables

/** Co-bucketed fact-table staging for shuffle-free joins.
  *
  * The 100 TB strategy for repeated large-fact joins (SURVEY §2.12 /
  * SCALE.md): pay the shuffle ONCE at write time — both tables bucketed
  * and sorted on the join key with the same bucket count — and every
  * subsequent join planwise skips both the Exchange and (with sorted
  * buckets) the Sort. [[Writers.bucketed]] does the write; this object
  * memoizes the staging per (session, sfDir) so driver-contract queries
  * can call it idempotently.
  */
object Bucketed {

  private val staged =
    scala.collection.concurrent.TrieMap[(Int, String, Int), (String, String)]()

  /** Stage `orders` + `lineitem` co-bucketed by order key (once per
    * session+dir+bucket-count); returns the catalog table names.
    */
  def ordersLineitem(spark: SparkSession, dir: String,
                     nBuckets: Int = 8): (String, String) =
    staged.getOrElseUpdate((System.identityHashCode(spark), dir, nBuckets), {
      // content-addressed tag: same (dir, nBuckets) -> same names/paths,
      // distinct sf dirs / bucket counts never collide in the warehouse
      // or catalog
      val tag = java.util.UUID.nameUUIDFromBytes(s"$dir#$nBuckets".getBytes("UTF-8"))
        .toString.replace("-", "").take(8)
      val base = s"${System.getProperty("java.io.tmpdir")}/graft_bucketed_$tag"
      val ot = s"bkt_orders_$tag"
      val lt = s"bkt_lineitem_$tag"
      Writers.bucketed(Tables.load(spark, dir, "orders"), ot,
        s"$base/orders", Seq("o_orderkey"), nBuckets, Seq("o_orderkey"))
      Writers.bucketed(Tables.load(spark, dir, "lineitem"), lt,
        s"$base/lineitem", Seq("l_orderkey"), nBuckets, Seq("l_orderkey"))
      (ot, lt)
    })
}
