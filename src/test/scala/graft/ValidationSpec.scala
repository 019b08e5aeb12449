package graft

import org.apache.spark.sql.functions._
import graft.operators.Validation
import graft.operators.Validation.RowRule

class ValidationSpec extends SparkSpec {

  private lazy val df = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, Some(10L), "A"),
      (2L, Some(-5L), "A"),  // violates positive
      (3L, None, "B"),       // NULL violates positive (unevaluable = violation)
      (3L, Some(7L), "Z"),   // dup key + bad flag
      (4L, Some(99L), "A")
    ).toDF("id", "amt", "flag")
      .select(col("id"), col("amt").cast("long"), col("flag"))
  }

  test("rowChecks: one scan, NULL predicates count as violations") {
    val m = Validation.rowChecks(df, Seq(
      RowRule("amt_positive", col("amt") > 0),
      RowRule("flag_domain", col("flag").isin("A", "B")),
      RowRule("id_small", col("id") < 100)))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m === Map("amt_positive" -> 2L, "flag_domain" -> 1L, "id_small" -> 0L))
  }

  test("unique counts rows beyond the first per key; clean key passes") {
    val dup = Validation.unique(df, Seq("id"), "u").collect()
    assert(dup(0).getString(0) === "u" && dup(0).getLong(1) === 1L)
    val clean = Validation.unique(df, Seq("id", "flag"), "u2").collect()
    assert(clean(0).getLong(1) === 0L)
  }

  test("refIntegrity counts orphans (broadcast anti probe)") {
    val s = spark
    import s.implicits._
    val parent = Seq(1L, 2L, 3L).toDF("pid")
    val got = Validation.refIntegrity(df, "id", parent, "pid", "fk").collect()
    assert(got(0).getString(0) === "fk" && got(0).getLong(1) === 1L) // id=4 orphan
  }

  test("report orders by check and derives pass") {
    val s = spark
    import s.implicits._
    val rep = Validation.report(Seq(
      Validation.rowChecks(df, Seq(RowRule("b_rule", col("id") > 0))),
      Validation.unique(df, Seq("id"), "a_rule")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    assert(rep.toSeq === Seq(("a_rule", 1L, false), ("b_rule", 0L, true)))
  }
}
