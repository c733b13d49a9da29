package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components via alternating large-star / small-star
  * rounds (Kiveris et al., "Connected Components in MapReduce and Beyond",
  * SoCC'14 — public literature). This is the piece that turns LSH candidate
  * PAIRS into duplicate CLUSTERS: near-dup relations are not transitive, so
  * corpus dedup keeps one survivor per connected component of the pair
  * graph, not per pair.
  *
  * Why this algorithm at 100 TB: each round is two groupBy/join rounds over
  * the current edge set — pure shuffle-based dataflow, no driver-side graph,
  * and the edge set only shrinks toward the star forest. Convergence is
  * O(log²  n) rounds in theory, 2-4 rounds in practice for dedup graphs
  * (small-diameter clusters). Contrast with label propagation, whose round
  * count is the component DIAMETER — a 1000-node chain takes 1000 rounds
  * there, ~10 here.
  *
  * Per-round hygiene: lazy `localCheckpoint` truncates the lineage that
  * iterative joins otherwise stack up (each round would replan the whole
  * history and re-execute it on every action). On a real cluster with a
  * fault-tolerance requirement, swap for reliable `checkpoint` on HDFS —
  * same call shape. Superseded rounds' checkpoint blocks are released by
  * the ContextCleaner once the loop rebinds past them (explicit
  * unpersist-by-RDD-id is unsafe here: the id registry is
  * context-global, and under a concurrent harness a snapshot diff could
  * capture — and later free — another query's blocks). Rounds shrink the
  * edge set monotonically, so transient retention is bounded by a couple
  * of rounds of the initial edge set.
  *
  * Reference behavior anchor: the reference dedups via per-key groupBy
  * (kaggle/kaggle.py drop_duplicates shapes); clustering generalizes that to
  * the near-dup relation produced by MinHash/SimHash banding (SURVEY §2
  * north-star extras).
  */
object ConnectedComponents {

  /** One large-star round: every node links its larger neighbors to the
    * minimum of its closed neighborhood.
    */
  private[operators] def largeStar(e: DataFrame): DataFrame = {
    val und = e.select(col("u"), col("v"))
      .union(e.select(col("v").as("u"), col("u").as("v")))
    val m = und.groupBy("u").agg(least(min(col("v")), col("u")).as("m"))
    und.join(m, "u")
      .where(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
  }

  /** One small-star round: every node links its smaller-or-equal neighbors
    * (and itself) to their minimum.
    */
  private[operators] def smallStar(e: DataFrame): DataFrame = {
    val dir = e.select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      .where(col("u") =!= col("v"))
    val m = dir.groupBy("u").agg(min("v").as("m"))
    val linkNeighbors = dir.join(m, "u")
      .where(col("v") =!= col("m"))
      .select(col("v").as("u"), col("m").as("v"))
    val linkSelf = m.select(col("u"), col("m").as("v"))
    linkNeighbors.union(linkSelf)
      .where(col("u") =!= col("v"))
      .distinct()
  }

  /** (count, hash-xor) set signature: two DISTINCT edge sets with equal
    * signatures are equal up to a 2⁻⁶⁴ hash-collision chance — the cheap
    * convergence test (an `except().isEmpty` would cost two extra shuffles
    * per round). XOR, not SUM: order-independent like sum but cannot
    * overflow under ANSI mode.
    */
  private def signature(e: DataFrame): (Long, Long) = {
    val r = e.agg(count(lit(1)),
      coalesce(call_function("bit_xor", xxhash64(col("u"), col("v"))), lit(0L))).head()
    (r.getLong(0), r.getLong(1))
  }

  /** Driver-side union-find (union-by-min + path compression): the small-
    * graph fast path. Returns (node → component-min) for non-root nodes.
    */
  private[operators] def unionFind(edges: Array[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.LongMap.empty[Long]
    // iterative find + path compression: a recursive find overflows the
    // stack on long parent chains (e.g. a path graph whose edges arrive
    // in descending order), and the threshold admits ~10⁶-edge graphs
    def find(x: Long): Long = {
      var root = x
      while (parent.getOrElse(root, root) != root) root = parent.getOrElse(root, root)
      var cur = x
      while (cur != root) {
        val next = parent.getOrElse(cur, cur)
        parent(cur) = root
        cur = next
      }
      root
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val out = Map.newBuilder[Long, Long]
    edges.foreach { case (a, b) =>
      val ra = find(a); if (a != ra) out += a -> ra
      val rb = find(b); if (b != rb) out += b -> rb
    }
    out.result()
  }

  /** Connected components of the undirected graph given by `edges` (two
    * numeric columns; self-loops and duplicates tolerated). Returns
    * (id, comp) for every NON-ROOT node — i.e. nodes absent from the output
    * are their own component representative (singletons included). comp is
    * the minimum node id of the component.
    *
    * HYBRID execution: a dedup pair graph is typically orders of magnitude
    * smaller than the corpus that produced it (it is the near-duplicate
    * relation, not the data). When the deduplicated edge set fits
    * comfortably on the driver (≤ `smallGraphThreshold` edges ≈ 16 B/edge)
    * it is collected and solved with union-find in one pass — the ~10
    * shuffle rounds of star contraction are pure overhead there. Larger
    * graphs take the distributed path. Same shape as production graph
    * libraries' small-graph fast paths; both paths produce identical
    * assignments (spec-enforced).
    */
  def components(edges: DataFrame, maxRounds: Int = 25,
                 smallGraphThreshold: Long = 1L << 20): DataFrame = {
    val cols = edges.columns
    require(cols.length == 2, s"expected 2 edge columns, got ${cols.mkString(",")}")
    // lazy checkpoints: the convergence-signature action right after is
    // what materializes them — one Spark job per round instead of two
    var e = edges.select(col(cols(0)).cast("long").as("u"), col(cols(1)).cast("long").as("v"))
      .where(col("u") =!= col("v") && col("u").isNotNull && col("v").isNotNull)
      .distinct()
      .localCheckpoint(false)
    var sig = signature(e)
    if (sig._1 <= smallGraphThreshold) {
      val arr = e.collect().map(r => (r.getLong(0), r.getLong(1)))
      val spark = e.sparkSession
      import spark.implicits._
      return unionFind(arr).toSeq.toDF("id", "comp")
    }
    var round = 0
    var converged = sig._1 == 0L
    while (!converged && round < maxRounds) {
      val next = smallStar(largeStar(e)).localCheckpoint(false)
      val nextSig = signature(next)
      converged = nextSig == sig
      e = next
      sig = nextSig
      round += 1
    }
    require(converged, s"connected components did not converge in $maxRounds rounds")
    // At the fixpoint e is a star forest (proved in the paper); the min-agg
    // is belt-and-braces determinism, not a correctness crutch.
    e.groupBy("u").agg(min("v").as("comp")).select(col("u").as("id"), col("comp"))
  }
}
