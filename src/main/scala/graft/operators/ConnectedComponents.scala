package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Connected components over a near-dup pair graph — the resolution
  * step of X2 cluster dedup (SURVEY.md §2.3): every vertex labeled with
  * the MIN vertex id of its component (the kept representative).
  *
  * Two physical strategies behind one contract:
  *
  *   - `unionFindSingleTask` — the verified-pair graph of a dedup
  *     pipeline is sparse relative to the corpus by construction
  *     (pairs are actual near-dups), so folding the edge list in ONE
  *     executor task with path-compressed union-find is O(E·α) and
  *     shuffle-free. Right up to tens of millions of pairs.
  *   - `minLabelPropagation` — the distributed fallback for a pair
  *     graph that outgrows a single task: each round propagates the
  *     min label across edges (one grouped shuffle) and then
  *     pointer-jumps labels through themselves (label := label(label)),
  *     which collapses chains in O(log diameter) rounds instead of
  *     O(diameter). Lineage is truncated per round with
  *     localCheckpoint — an iterative DataFrame loop otherwise doubles
  *     the plan every round and dies in ANALYSIS, not execution.
  *
  * Both reach the same unique fixpoint (labels only ever move along
  * edges, start as vertex ids, and decrease monotonically — so the
  * stable labeling is exactly "component min id"); the spec proves
  * fixpoint equality on planted graphs including a multi-round chain.
  */
object ConnectedComponents {

  /** Routing default: below this many pairs the single-task fold wins
    * (no shuffle rounds); above it the iterative path takes over. */
  val SingleTaskMaxPairs: Long = 10000000L

  /** `pairs`: two LongType columns (vertex a, vertex b), one row per
    * undirected edge. Returns (doc_id, cluster_id) for every vertex
    * that appears in `pairs` — singletons are the caller's left-join. */
  def resolve(pairs: DataFrame, singleTaskMaxPairs: Long = SingleTaskMaxPairs): DataFrame = {
    // materialize the canonical pair list ONCE (eager checkpoint, lineage
    // truncated): the routing count and the chosen resolution path both
    // read the same cached blocks — without this the expensive
    // candidate-pair join upstream would execute twice, once for the
    // count and again for the result. Data-dependent routing makes
    // resolve() eager by nature; callers construct it per execution.
    val canon = canonical(pairs).localCheckpoint(true)
    if (canon.count() <= singleTaskMaxPairs) unionFindSingleTask(canon)
    else minLabelPropagation(canon)
  }

  private def canonical(pairs: DataFrame): DataFrame = {
    val cols = pairs.columns
    require(cols.length == 2, s"pairs must have exactly 2 columns, got ${cols.mkString(",")}")
    pairs.select(col(cols(0)).cast("long").as("a"), col(cols(1)).cast("long").as("b"))
  }

  /** Path-compressed union-find over the whole edge list in one task. */
  def unionFindSingleTask(pairs: DataFrame): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    canonical(pairs).as[(Long, Long)]
      .coalesce(1)
      .mapPartitions { it =>
        val parent = scala.collection.mutable.HashMap[Long, Long]()
        def find(x: Long): Long = {
          var r = x
          while (parent(r) != r) r = parent(r)
          var c = x
          while (parent(c) != c) { val n = parent(c); parent(c) = r; c = n }
          r
        }
        it.foreach { case (a, b) =>
          parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
          val ra = find(a); val rb = find(b)
          // union keeps the SMALLER root → the final root of every
          // component is its min vertex id, the representative
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        parent.keys.toArray.iterator.map(k => (k, find(k)))
      }
      .toDF("doc_id", "cluster_id")
  }

  /** Distributed min-label propagation with pointer jumping. Each round
    * is two bounded-key shuffles (neighbor-min groupBy + label-table
    * self-join); rounds needed ≈ log₂(max component diameter). */
  def minLabelPropagation(pairs: DataFrame, maxRounds: Int = 64): DataFrame = {
    val edges = {
      val p = canonical(pairs)
      p.select(col("a").as("src"), col("b").as("dst"))
        .unionByName(p.select(col("b").as("src"), col("a").as("dst")))
        .distinct()
        .localCheckpoint(true)
    }
    var labels = edges.select(col("src").as("v")).distinct()
      .select(col("v"), col("v").as("label"))
      .localCheckpoint(true)
    var converged = false
    var round = 0
    while (!converged) {
      round += 1
      require(round <= maxRounds,
        s"connected components did not converge in $maxRounds rounds")
      // 1) propagate: candidate label = min(own, min over neighbors)
      val neighborMin = edges.join(labels, edges("src") === labels("v"))
        .groupBy(col("dst").as("nv")).agg(min("label").as("nmin"))
      val prop = labels.join(neighborMin, col("v") === col("nv"), "left")
        .select(col("v"), least(col("label"), coalesce(col("nmin"), col("label"))).as("label"))
      // 2) pointer jump: label := label(label). Labels are vertex ids,
      // so every label has a row in prop; the left-join coalesce only
      // guards the invariant, it never fires on a well-formed graph.
      val lw = prop.select(col("v").as("lv"), col("label").as("llabel"))
      val jumped = prop.join(lw, prop("label") === lw("lv"), "left")
        .select(prop("v"), coalesce(col("llabel"), prop("label")).as("label"))
        .localCheckpoint(true) // truncate lineage — plan must not grow per round
      converged = jumped.as("n")
        .join(labels.as("o"), col("n.v") === col("o.v"))
        .filter(col("n.label") =!= col("o.label"))
        .isEmpty
      labels = jumped
    }
    labels.select(col("v").as("doc_id"), col("label").as("cluster_id"))
  }
}
