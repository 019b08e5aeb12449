package graft

import java.nio.file.Files

import graft.plans.TableRegistry

/** Durable named catalog (r15 verdict Next #2): with `graft.catalog.root`
  * configured, `log_register` bindings commit to a commit-log table of
  * bindings and a fresh session resolves them at init; without the conf,
  * the registry stays memory-only exactly as before.
  */
class CatalogPersistenceSpec extends SparkSpec {

  private def kv(pairs: (Long, String)*) = {
    val s = spark
    import s.implicits._
    pairs.toDF("k", "v")
  }

  private def withRoot[T](root: String)(body: => T): T = {
    spark.conf.set("graft.catalog.root", root)
    try body finally spark.conf.unset("graft.catalog.root")
  }

  test("bindings survive a simulated restart; re-register updates; unknown names still fail with the known list") {
    val dir = Files.createTempDirectory("graft-cat").toString
    val t = new graft.operators.CommitTable(spark, s"$dir/tbl", "k")
    t.overwrite(kv(1L -> "a", 2L -> "b"))
    withRoot(s"$dir/cat") {
      TableRegistry.register("cat_spec_t1", s"$dir/tbl", "k", Seq("v2"))
      // "restart": memory wiped, committed catalog reloaded (what
      // GraftSession.create does at init)
      TableRegistry.clearMemory()
      assert(TableRegistry.loadPersisted(spark) === 1)
      assert(TableRegistry.resolveFull("cat_spec_t1") === ((s"$dir/tbl", "k", Seq("v2"))))
      // by-name SQL read works post-restart
      val n = spark.sql("SELECT COUNT(*) FROM log_table('cat_spec_t1')").head().getLong(0)
      assert(n === 2L)
      // re-register replaces the binding durably (merge-by-name)
      TableRegistry.register("cat_spec_t1", s"$dir/tbl", "k", Nil)
      TableRegistry.clearMemory()
      TableRegistry.loadPersisted(spark)
      assert(TableRegistry.resolveFull("cat_spec_t1") === ((s"$dir/tbl", "k", Seq())))
      // several bindings round-trip
      TableRegistry.register("cat_spec_t2", s"$dir/tbl", "k")
      TableRegistry.clearMemory()
      assert(TableRegistry.loadPersisted(spark) === 2)
      // unknown name error unchanged
      val e = intercept[IllegalArgumentException](TableRegistry.resolve("cat_spec_nope"))
      assert(e.getMessage.contains("unknown registered table"))
      assert(e.getMessage.contains("cat_spec_t1"))
    }
  }

  test("without a catalog root the registry stays memory-only (no directory, no commits)") {
    val dir = Files.createTempDirectory("graft-cat-none").toString
    val t = new graft.operators.CommitTable(spark, s"$dir/tbl", "k")
    t.overwrite(kv(1L -> "a"))
    TableRegistry.register("cat_spec_mem", s"$dir/tbl", "k")
    assert(TableRegistry.resolve("cat_spec_mem") === ((s"$dir/tbl", "k")))
    assert(!new java.io.File(s"$dir/cat").exists())
    // loadPersisted is a no-op without the conf
    assert(TableRegistry.loadPersisted(spark) === 0)
  }
}
