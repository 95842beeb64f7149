package graft

import org.apache.spark.sql.DataFrame

import graft.operators.ConnectedComponents

/** The two component-resolution strategies must reach the identical
  * fixpoint: every vertex labeled with the min vertex id of its
  * component. The planted graph exercises the shapes that break naive
  * propagation: a long chain (multiple rounds even with pointer
  * jumping), a star whose center is NOT its component min, a cycle,
  * label movement against edge direction, and disjoint two-node
  * components.
  */
class ConnectedComponentsSpec extends SparkSpec {

  // chain 100→…→110 (min 100 at one END — worst case for propagation),
  // star centered at 207 with min 200 on a leaf, cycle 300..303,
  // two-node components {400,401} and {502,501}, plus id order flipped
  private val edges: Seq[(Long, Long)] = (100L until 110L).map(v => (v + 1, v)) ++
    Seq((207L, 205L), (207L, 200L), (207L, 206L), (201L, 207L)) ++
    Seq((300L, 301L), (301L, 302L), (302L, 303L), (303L, 300L)) ++
    Seq((400L, 401L), (502L, 501L))

  private val expected: Map[Long, Long] =
    ((100L to 110L).map(_ -> 100L) ++
      Seq(200L, 201L, 205L, 206L, 207L).map(_ -> 200L) ++
      (300L to 303L).map(_ -> 300L) ++
      Seq(400L -> 400L, 401L -> 400L, 501L -> 501L, 502L -> 501L)).toMap

  private def pairsDf: DataFrame = {
    import spark.implicits._
    edges.toDF("doc_a", "doc_b")
  }

  private def toMap(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("single-task union-find labels every component with its min id") {
    assert(toMap(ConnectedComponents.unionFindSingleTask(pairsDf)) === expected)
  }

  test("iterative min-label propagation reaches the same fixpoint (multi-round chain included)") {
    assert(toMap(ConnectedComponents.minLabelPropagation(pairsDf)) === expected)
  }

  test("resolve routes by pair count: threshold 0 forces the iterative path, default the single-task path") {
    assert(toMap(ConnectedComponents.resolve(pairsDf, singleTaskMaxPairs = 0L)) === expected)
    assert(toMap(ConnectedComponents.resolve(pairsDf)) === expected)
  }

  test("propagation matches union-find on a random graph (property check)") {
    import spark.implicits._
    // deterministic pseudo-random edges: md5-derived, no RNG
    val n = 400
    val rnd = (0 until n).map { i =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"cc_$i".getBytes("UTF-8"))
      val a = math.abs(java.nio.ByteBuffer.wrap(h, 0, 8).getLong) % 1000
      val b = math.abs(java.nio.ByteBuffer.wrap(h, 8, 8).getLong) % 1000
      (a, b)
    }.filter { case (a, b) => a != b }
    val df = rnd.toDF("doc_a", "doc_b")
    assert(toMap(ConnectedComponents.minLabelPropagation(df))
      === toMap(ConnectedComponents.unionFindSingleTask(df)))
  }
}
