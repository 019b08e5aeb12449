package graft

import java.nio.file.Files
import graft.sources.TableFormats
import org.apache.spark.SparkException
import org.apache.spark.sql.types.StructType

class TableFormatsSpec extends SparkSpec {

  private def tmp(name: String) = Files.createTempDirectory("graft-fmt").resolve(name).toString

  private def sampleDocs = {
    val s = spark
    import s.implicits._
    Seq((1L, "hello world", "en"), (2L, "guten tag", "de")).toDF("doc_id", "text", "lang")
  }

  test("csv round-trip preserves rows and schema") {
    val p = tmp("docs_csv")
    TableFormats.writeCsv(sampleDocs, p)
    val back = TableFormats.readCsv(spark, p, StructType.fromDDL("doc_id LONG, text STRING, lang STRING"))
    // nullability differs by construction (file reads are always nullable)
    assert(back.schema.map(f => (f.name, f.dataType)) ===
      sampleDocs.schema.map(f => (f.name, f.dataType)))
    assert(back.collect().map(_.toSeq).toSet === sampleDocs.collect().map(_.toSeq).toSet)
  }

  test("jsonl round-trip preserves rows") {
    val p = tmp("docs_json")
    TableFormats.writeJsonl(sampleDocs, p)
    val back = TableFormats.readJsonl(spark, p, StructType.fromDDL("doc_id LONG, text STRING, lang STRING"))
    assert(back.collect().map(_.toSeq).toSet === sampleDocs.collect().map(_.toSeq).toSet)
  }

  test("FAILFAST surfaces malformed json instead of nulling it") {
    val p = tmp("bad.jsonl")
    Files.writeString(java.nio.file.Paths.get(p), "{\"doc_id\": 1, \"text\": \"ok\"}\n{not json}\n")
    val df = TableFormats.readJsonl(spark, p, StructType.fromDDL("doc_id LONG, text STRING"))
    intercept[SparkException](df.collect())
  }

  test("permissive mode keeps malformed rows inspectable") {
    val p = tmp("bad2.jsonl")
    Files.writeString(java.nio.file.Paths.get(p), "{\"doc_id\": 1, \"text\": \"ok\"}\n{not json}\n")
    val rows = TableFormats.readJsonlPermissive(spark, p, StructType.fromDDL("doc_id LONG, text STRING"))
      .collect()
    assert(rows.length === 2)
    assert(rows.count(!_.isNullAt(2)) === 1) // one corrupt record captured
  }

  test("edge-list csv feeds the graph surface") {
    val p = tmp("edges.csv")
    Files.writeString(java.nio.file.Paths.get(p), "src,dst\n0,1\n1,2\n")
    val e = TableFormats.readEdgeCsv(spark, p)
    assert(vertexLevels(graph.Traversals.bfs(e, 0L)) === Seq((0L, 0), (1L, 1), (2L, 2)))
  }
}
