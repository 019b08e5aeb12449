package graft.tools

import graft._
import graft.llm.TextOps
import org.apache.spark.sql.functions._

/** Throwaway measurement scratchpad for the optimization round (not driver
  * contract; edited per experiment, run via `runMain graft.tools.Scratch`).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create(master = "local[32]", cores = "32")
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time(label: String)(f: => Long): Unit = {
      f // warm
      val t0 = System.nanoTime()
      val n = f
      println(f"[scratch] $label%-40s ${(System.nanoTime() - t0) / 1e9}%6.2fs rows=$n")
    }
    val docs = Tables.documents(spark, dir)
    val par = spark.sparkContext.defaultParallelism

    // A: current shape — tokens() nested inside shingles3's lambda
    val a = docs.repartition(par)
      .select(col("doc_id"),
        explode(TextOps.shingles3(TextOps.tokens(col("text")))).as("shingle"))
    time("nested tokens in lambda")(a.count())

    // B: tokens bound to a column first, shingles3 over the attribute
    val b = docs.repartition(par)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("ws"))
      .select(col("doc_id"), explode(TextOps.shingles3(col("ws"))).as("shingle"))
    time("pre-bound tokens column")(b.count())

    // C: charNgrams current (lower(text) inside lambda) vs pre-bound
    val c1 = docs.repartition(par)
      .select(col("doc_id"), explode(TextOps.charNgrams(col("text"), 6)).as("g"))
    time("charNgrams nested")(c1.count())
    val c2 = docs.repartition(par)
      .select(col("doc_id"), lower(col("text")).as("t"))
      .select(col("doc_id"), explode(
        when(length(col("t")) >= 6,
          array_distinct(transform(sequence(lit(1), length(col("t")) - 5),
            i => col("t").substr(i, lit(6)))))
          .otherwise(array().cast("array<string>"))).as("g"))
    time("charNgrams pre-bound")(c2.count())
    spark.stop()
  }
}
