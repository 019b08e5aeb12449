package graft

import graft.functions.VectorExpressions
import org.apache.spark.sql.functions._

class VectorExpressionsSpec extends SparkSpec {

  private def vecsDF(rows: Seq[(Long, Seq[Double], Seq[Double])]) = {
    val s = spark
    import s.implicits._
    rows.toDF("id", "a", "b")
  }

  test("dotProduct: exact value, both codegen and interpreted paths") {
    val df = vecsDF(Seq((1L, Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))))
      .select(VectorExpressions.dotProduct(col("a"), col("b")).as("d"))
    assert(df.head.getDouble(0) === 32.0)
    // force the interpreted path too (wholeStage off)
    val s = spark
    s.conf.set("spark.sql.codegen.wholeStage", "false")
    try assert(df.head.getDouble(0) === 32.0)
    finally s.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("dotProduct: equals the higher-order-function fold it replaced") {
    val rng = new scala.util.Random(5)
    val rows = (1L to 50L).map(i =>
      (i, Seq.fill(16)(rng.nextDouble()), Seq.fill(16)(rng.nextDouble())))
    val df = vecsDF(rows)
    val native = df.select(col("id"), VectorExpressions.dotProduct(col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val hof = df.select(col("id"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0), (acc, x) => acc + x).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // bit-for-bit: same summation order
    rows.foreach { case (i, _, _) => assert(native(i) === hof(i)) }
  }

  test("dot_product is callable from SQL (SparkSessionExtensions registration)") {
    vecsDF(Seq((1L, Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)))).createOrReplaceTempView("vx")
    assert(spark.sql("SELECT dot_product(a, b) AS d FROM vx").head.getDouble(0) === 32.0)
  }

  test("sorted_intersect_count is callable from SQL") {
    val s = spark
    import s.implicits._
    Seq((Seq(1L, 3L, 5L), Seq(2L, 3L, 5L, 9L))).toDF("a", "b").createOrReplaceTempView("ix")
    assert(spark.sql("SELECT sorted_intersect_count(a, b) AS c FROM ix").head.getLong(0) === 2L)
  }

  test("sortedIntersectCount: merge result == array_intersect size, codegen and interpreted") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(13)
    val rows = (1L to 60L).map { i =>
      val a = Seq.fill(40)(rng.nextInt(80).toLong).distinct.sorted
      val b = Seq.fill(40)(rng.nextInt(80).toLong).distinct.sorted
      (i, a, b)
    } ++ Seq((61L, Seq.empty[Long], Seq(1L, 2L)), (62L, Seq(5L), Seq(5L)))
    val df = rows.toDF("id", "a", "b")
    def got = df.select(col("id"),
        VectorExpressions.sortedIntersectCount(col("a"), col("b")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = df.select(col("id"), size(array_intersect(col("a"), col("b"))).cast("long").as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
    s.conf.set("spark.sql.codegen.wholeStage", "false")
    try assert(got === want)
    finally s.conf.set("spark.sql.codegen.wholeStage", "true")
    // a null ARRAY propagates null (the element-level null-free contract
    // is about slots inside the array, not the column being nullable)
    val nullFree = org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, containsNull = false)
    val n = df.limit(1).select(
      VectorExpressions.sortedIntersectCount(col("a"), lit(null).cast(nullFree)).as("c"))
    assert(n.head.isNullAt(0))
  }

  test("sortedIntersectCount rejects null-bearing array types at analysis time") {
    // getLong on a null slot would silently read 0 and miscount — the
    // documented null-free contract is enforced in checkInputDataTypes
    val s = spark
    import s.implicits._
    val df = Seq((1L, Seq(1L, 2L), Seq(2L, 3L))).toDF("id", "a", "b")
    val nullable = df.select(col("id"),
      col("a").cast("array<bigint>").as("a"), col("b").as("b")) // cast -> containsNull=true
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      nullable.select(VectorExpressions.sortedIntersectCount(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.contains("sorted_intersect_count"))
  }

  test("dotProduct: null array -> null; shorter array wins; null elements skipped") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, Seq(1.0, 2.0), Seq(3.0))).toDF("id", "a", "b")
    assert(df.select(VectorExpressions.dotProduct(col("a"), col("b"))).head.getDouble(0) === 3.0)
    val withNull = df.select(VectorExpressions.dotProduct(col("a"), lit(null).cast("array<double>")).as("d"))
    assert(withNull.head.isNullAt(0))
  }
}
