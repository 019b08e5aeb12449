package graft

import graft.operators.Partitioning
import org.apache.spark.sql.functions._

class PartitioningSpec extends SparkSpec {

  test("bucketed tables join with zero exchanges (co-located)") {
    val s = spark
    import s.implicits._
    val facts = (1L to 10000L).map(i => (i % 97, i, i * 2.0)).toDF("k", "id", "v")
    val dims = (0L until 97L).map(i => (i, s"dim$i")).toDF("k", "name")
    Partitioning.writeBucketed(facts, "b_facts", "k", buckets = 8)
    Partitioning.writeBucketed(dims, "b_dims", "k", buckets = 8)
    val joined = Partitioning.readTable(s, "b_facts")
      .join(Partitioning.readTable(s, "b_dims"), "k")
    assert(joined.count() === 10000L)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("ShuffleExchange"), s"expected exchange-free plan, got:\n$plan")
  }

  test("bucketed aggregation on the bucket key is exchange-free") {
    val agg = Partitioning.readTable(spark, "b_facts").groupBy("k").agg(sum("v"))
    agg.collect()
    assert(!agg.queryExecution.executedPlan.toString.contains("ShuffleExchange"))
  }

  test("saltedJoin returns exactly the plain join result on skewed data") {
    val s = spark
    import s.implicits._
    // 90% of rows share one key — the pathological shape
    val big = (1L to 20000L).map(i => (if (i % 10 == 0) i % 7 else 3L, i)).toDF("k", "id")
    val small = (0L until 7L).map(i => (i, s"d$i")).toDF("k", "name")
    val plain = big.join(small, "k").collect().map(_.toSeq).toSet
    val salted = Partitioning.saltedJoin(big, small, "k", salts = 8).collect().map(_.toSeq).toSet
    assert(salted === plain && plain.nonEmpty)
  }
}
