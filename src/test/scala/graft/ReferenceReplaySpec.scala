package graft

import java.nio.file.Files
import graft.graph.GraphCatalog
import graft.sources.MatrixFormat

/** SURVEY §5.4: scripted replay of a reference client session
  * (menu `client.c:26-31`) through the engine's API — add (op 1) → modify
  * (op 2) → DFS (op 3) → BFS (op 4) — asserting replies equivalent to the
  * reference's semantics modulo the canonical ordering of §2.2.
  *
  * The graph is the kind of ≤30-vertex, 1-based-id adjacency matrix a
  * reference user would type into the client (`client.c:77-94`), shipped
  * through the compat dense-matrix format both ways.
  */
class ReferenceReplaySpec extends SparkSpec {

  test("reference session: add, modify, DFS, BFS") {
    val root = Files.createTempDirectory("graft-replay")
    val cat = new GraphCatalog(spark, root.resolve("graphs").toString)

    // -- op 1: add graph "g1" from a hand-typed 5-vertex matrix ------------
    val mtx = root.resolve("g1.txt")
    Files.writeString(mtx,
      """5
        |0 1 1 0 0
        |0 0 0 1 0
        |0 0 0 1 0
        |0 0 0 0 1
        |0 0 0 0 0
        |""".stripMargin)
    cat.addGraph("g1", MatrixFormat.readEdges(spark, mtx.toString))
    assert(cat.listGraphs() === Seq("g1")) // reply: "File successfully added"

    // -- op 4: BFS from vertex 1 (includes start, secondaryServer.c:380) ---
    assert(vertexLevels(cat.bfs("g1", 1L)) ===
      Seq((1L, 0), (2L, 1), (3L, 1), (4L, 2), (5L, 3)))

    // -- op 3: DFS from vertex 1 — reference records traversal-tree leaves
    //    minus the start (secondaryServer.c:93-97, :290). Vertex 3 is a
    //    leaf too: by the time DFS reaches it, its only neighbor 4 is
    //    already visited, so it spawns nothing -----------------------------
    assert(vertexSet(cat.dfsLeaves("g1", 1L)) === Set(3L, 5L))
    // canonical preorder variant (§2.2(1)): lowest-id neighbor first
    assert(cat.dfs("g1", 1L).collect().map(_.getLong(0)).toSeq ===
      Seq(1L, 2L, 4L, 5L, 3L))

    // -- op 2: modify = wholesale overwrite (primaryServer.c:40) -----------
    val mtx2 = root.resolve("g1b.txt")
    Files.writeString(mtx2, "3\n0 1 0\n0 0 1\n0 0 0\n")
    cat.modifyGraph("g1", MatrixFormat.readEdges(spark, mtx2.toString))
    assert(vertexLevels(cat.bfs("g1", 1L)) === Seq((1L, 0), (2L, 1), (3L, 2)))

    // -- round-trip the modified graph back out through the compat sink ----
    val out = root.resolve("g1_out.txt")
    MatrixFormat.writeMatrix(spark, cat.graph("g1"), out.toString, vertexCount = Some(3))
    assert(Files.readString(out) === "3\n0 1 0\n0 0 1\n0 0 0\n")

    // validation the reference lacks (§2.2(3)): bad start vertex errors
    intercept[IllegalArgumentException](cat.bfs("g1", 0L))

    // -- isolated vertices survive the full ingest path: a matrix with an
    //    all-zero last row/column is legal (header n is the truth) ---------
    val mtx3 = root.resolve("g2.txt")
    Files.writeString(mtx3, "3\n0 1 0\n0 0 0\n0 0 0\n")
    val (e2, v2) = MatrixFormat.readGraph(spark, mtx3.toString)
    cat.addGraph("g2", e2, Some(v2))
    assert(vertexLevels(cat.bfs("g2", 3L)) === Seq((3L, 0))) // isolated start
    assert(vertexSet(cat.vertices("g2"), "id") === Set(1L, 2L, 3L))
  }
}
