package graft

import org.apache.spark.sql.functions._

import graft.functions.WeightedMean

class SourceOpsSpec extends SparkSpec {
  import spark.implicits._

  test("bloom prefilter keeps all matches and prunes most non-matches") {
    val dir = "/root/testdata/sf0.01"
    val li = graft.tables.Tables.lineitem(spark, dir)
    val orders = graft.tables.Tables.orders(spark, dir)
      .filter($"o_totalprice" > 400000.0).select($"o_orderkey")
    // the q74 path: build with bloom_bits + executor-side packing, probe
    // with the codegen'd twin kernel — no false negative is tolerable
    // (a dropped true match silently corrupts the join result)
    val mBits = 1 << 17
    val kHashes = 7
    val pack = udaf(new graft.functions.BloomPackAgg(mBits))
    val packed = orders
      .select(explode(graft.functions.GraftFunctions.bloom_bits(
        $"o_orderkey".cast("string"), mBits, kHashes)).as("_pos"))
      .agg(pack($"_pos")).head.getAs[Array[Byte]](0)
    val bits = graft.functions.HashKernels.packedBytesToLongs(packed)

    val total = li.count()
    val kept = li.filter(graft.functions.GraftFunctions.bloom_might_contain(
      $"l_orderkey".cast("string"), bits, mBits, kHashes)).count()
    val exact = li.join(orders, $"l_orderkey" === $"o_orderkey", "left_semi").count()
    val missed = li.join(orders, $"l_orderkey" === $"o_orderkey", "left_semi")
      .filter(!graft.functions.GraftFunctions.bloom_might_contain(
        $"l_orderkey".cast("string"), bits, mBits, kHashes)).count()
    assert(missed == 0, s"bloom filter dropped $missed true matches")
    assert(kept >= exact, "bloom filter dropped a true match")
    assert(kept < total / 2,
      s"bloom filter pruned almost nothing: kept $kept of $total")
  }

  test("WeightedMean is exact under any partitioning (merge-order-free)") {
    val li = graft.tables.Tables.lineitem(spark, "/root/testdata/sf0.01")
      .select($"l_extendedprice", $"l_quantity")
    val wavg = udaf(WeightedMean)
    def run(parts: Int): Double =
      li.repartition(parts).agg(wavg($"l_extendedprice", $"l_quantity")).head().getDouble(0)
    val r1 = run(1)
    assert(r1 == run(7) && r1 == run(32), "merge order changed the result")
  }

  test("TopKAgg is invariant to partitioning and matches a full sort") {
    val orders = graft.tables.Tables.orders(spark, "/root/testdata/sf0.001")
      .select($"o_custkey", $"o_totalprice", $"o_orderkey")
    val top3 = udaf(new graft.functions.TopKAgg(3))
    def run(parts: Int) = orders.repartition(parts)
      .groupBy($"o_custkey")
      .agg(top3($"o_totalprice", $"o_orderkey").as("top"))
      .orderBy($"o_custkey")
      .as[(Long, Seq[(Double, Long)])].collect().toSeq
    val r1 = run(1)
    assert(r1 == run(13), "merge order changed the top-k")
    // against the brute-force sorted answer for one customer
    val c = r1.head._1
    val expected = orders.filter($"o_custkey" === c)
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc).limit(3)
      .select($"o_totalprice", $"o_orderkey")
      .as[(Double, Long)].collect().toSeq
    assert(r1.head._2 == expected)
  }

  test("WeightedMean of an empty group is NaN, not a crash") {
    val empty = Seq.empty[(Double, Double)].toDF("p", "q")
    val wavg = udaf(WeightedMean)
    assert(empty.agg(wavg($"p", $"q")).head().getDouble(0).isNaN)
  }
}
