package graft

import graft.operators.TemporalJoins
import org.scalacheck.{Gen, Prop, Properties, Test}

/** ScalaCheck properties: the temporal join operators vs brute-force driver
  * oracles on random event sets — the same independent-model discipline the
  * graph traversals use.
  */
object TemporalJoinsProps extends Properties("TemporalJoins") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10).withMaxDiscardRatio(10)

  private def spark = TestSpark.spark

  // (key, time, unique id) event sets; tight key/time ranges force
  // collisions (same-instant ties, multi-match keys, empty keys)
  private val genEvents: Gen[List[(Long, Long, Long)]] = for {
    n <- Gen.choose(0, 60)
    rows <- Gen.listOfN(n, for {
      k <- Gen.choose(0L, 4L)
      t <- Gen.choose(0L, 50L)
    } yield (k, t))
  } yield rows.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong + 1) }

  private def df(rows: List[(Long, Long, Long)], t: String, id: String) = {
    val s = spark
    import s.implicits._
    rows.toDF("k", t, id)
  }

  property("asofJoin == per-left-row max (t, id) right scan") =
    Prop.forAll(genEvents, genEvents) { (left, right) =>
      val got = TemporalJoins.asofJoin(
        df(left, "lt", "lid"), df(right, "rt", "rid"),
        key = "k", leftTime = "lt", rightTime = "rt",
        rightValues = Seq("rid" -> "m"), rightTieBreak = Seq("rid"))
        .collect().map(r => r.getLong(2) -> (if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
      val want = left.map { case (k, lt, lid) =>
        val prior = right.filter(r => r._1 == k && r._2 <= lt)
        lid -> (if (prior.isEmpty) -1L else prior.maxBy(r => (r._2, r._3))._3)
      }.toMap
      Prop(got == want) :| s"got $got want $want"
    }

  property("rangeJoin == brute-force inclusive range filter") =
    Prop.forAll(genEvents, genEvents, Gen.choose(1L, 20L)) { (left, right, w) =>
      val got = TemporalJoins.rangeJoin(
        df(left, "lt", "lid"), df(right, "rt", "rid"),
        key = "k", leftTime = "lt", rightTime = "rt", window = w)
        .collect().map(r => (r.getLong(2), r.getLong(4))).sorted.toSeq
      val want = (for {
        (k, lt, lid) <- left
        (k2, rt, rid) <- right
        if k2 == k && rt >= lt && rt - lt <= w
      } yield (lid, rid)).sorted
      Prop(got == want) :| s"got $got want $want"
    }
}
