package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import graft.operators.{CommitTable, CoordinatedPutLogStore, LogStore, RenameLogStore}

/** The pluggable commit primitive (r15 verdict Next #1): exactly-one-winner
  * and full-visibility must hold WITHOUT rename-if-absent semantics — the
  * property an object-store deployment needs — and every CommitTable race
  * behavior (append auto-rebase, merge conflict, stale-head rejection)
  * must be identical under the coordinated-put store.
  */
class LogStoreSpec extends SparkSpec {

  private def kv(pairs: (Long, String)*) = {
    val s = spark
    import s.implicits._
    pairs.toDF("k", "v")
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
    df.collect().map(r => (r.getLong(0), r.getString(1))).toSet

  private def withStore[T](name: String)(body: => T): T = {
    spark.conf.set("graft.log.store", name)
    try body finally spark.conf.unset("graft.log.store")
  }

  test("coordinated-put: N writers race one destination — exactly one wins, no rename-if-absent involved") {
    val dir = Files.createTempDirectory("graft-lstore-race").toString
    val store = new CoordinatedPutLogStore
    val conf = spark.sparkContext.hadoopConfiguration
    val dest = new Path(dir, "00000000000000000000.json")
    val n = 8
    val pool = java.util.concurrent.Executors.newFixedThreadPool(n)
    val gate = new java.util.concurrent.CountDownLatch(1)
    val outcomes = (0 until n).map { i =>
      pool.submit(new java.util.concurrent.Callable[Either[Throwable, Int]] {
        def call(): Either[Throwable, Int] = {
          gate.await()
          try { store.putIfAbsent(conf, dest, s"writer-$i".getBytes); Right(i) }
          catch { case t: Throwable => Left(t) }
        }
      })
    }
    gate.countDown()
    val results = outcomes.map(_.get())
    pool.shutdown()
    val winners = results.collect { case Right(i) => i }
    assert(winners.size === 1, s"exactly one writer must win, got $results")
    results.collect { case Left(t) => t }.foreach(t =>
      assert(t.isInstanceOf[org.apache.hadoop.fs.FileAlreadyExistsException],
        s"losers must see the contract failure, got $t"))
    val content = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "00000000000000000000.json")))
    assert(content === s"writer-${winners.head}",
      "the visible content must be exactly the winner's (full visibility)")
    // the claim is permanent: a later attempt on the same version loses too
    intercept[org.apache.hadoop.fs.FileAlreadyExistsException](
      store.putIfAbsent(conf, dest, "late".getBytes))
  }

  test("coordinated-put: a claim also loses against a FOREIGN writer's materialized file") {
    val dir = Files.createTempDirectory("graft-lstore-foreign").toString
    val conf = spark.sparkContext.hadoopConfiguration
    val dest = new Path(dir, "00000000000000000007.json")
    // a renaming writer (different store — no shared coordination) lands first
    new RenameLogStore().putIfAbsent(conf, dest, "foreign".getBytes)
    intercept[org.apache.hadoop.fs.FileAlreadyExistsException](
      new CoordinatedPutLogStore().putIfAbsent(conf, dest, "late".getBytes))
    val content = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "00000000000000000007.json")))
    assert(content === "foreign")
  }

  test("CommitTable races behave identically under coordinated-put: append auto-rebase lands both, stale merge conflicts") {
    withStore("coordinated-put") {
      val dir = Files.createTempDirectory("graft-lstore-rebase").toString
      val t = new CommitTable(spark, dir, "k")
      t.overwrite(kv(1L -> "a"))
      val interloper = new CommitTable(spark, dir, "k")
      var calls = 0
      val racing = new CommitTable(spark, dir, "k") {
        override protected def nextVersion(): Long = {
          calls += 1
          val v = super.nextVersion()
          if (calls == 1) interloper.append(kv(2L -> "i"))
          v
        }
      }
      val got = racing.append(kv(3L -> "r"))
      assert(calls === 2, "the first attempt must lose the put race and rebase")
      assert(got === 2L)
      val fresh = new CommitTable(spark, dir, "k")
      assert(fresh.versions() === Seq(0L, 1L, 2L))
      assert(rows(fresh.read()) === Set(1L -> "a", 2L -> "i", 3L -> "r"),
        "both racing appends must land under the no-rename store")

      // read-modify-write stays single-winner: a stale-head writer's commit
      // is rejected by the same CME signal
      val stale = new CommitTable(spark, dir, "k") {
        override protected def nextVersion(): Long = 1L // head is already 2
      }
      intercept[java.util.ConcurrentModificationException](
        stale.append(kv(9L -> "z")))
    }
  }

  test("store selection: default is rename; FQCN resolves; non-LogStore FQCN fails loudly") {
    assert(LogStore.forSession(spark).isInstanceOf[RenameLogStore])
    withStore(classOf[CoordinatedPutLogStore].getName) {
      assert(LogStore.forSession(spark).isInstanceOf[CoordinatedPutLogStore])
    }
    withStore("java.lang.Object") {
      intercept[IllegalArgumentException](LogStore.forSession(spark))
    }
  }
}
