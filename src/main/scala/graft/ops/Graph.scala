package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Distributed graph analytics over plain edge DataFrames — the
 * companion family to `Dedup.components` (which resolves near-dup
 * clusters): node-importance ranking for link/co-occurrence graphs a
 * curation pipeline builds anyway (co-purchase graphs, document
 * citation/link graphs for quality priors à la PageRank-seeded crawl
 * ordering). Reference analogue: none — extension surface.
 *
 * Determinism design: ranks are FIXED-POINT integers (units of
 * 1/`Scale`), every update is integer multiply / integer divide /
 * integer sum — no floating point anywhere, so any engine replaying
 * the same recurrence reproduces the ranks BIT-EXACTLY. (The usual
 * double-based PageRank differs across engines in the ULPs of every
 * re-ordered sum; the decimal-sum trick `Clustering.kmeans` uses fixes
 * the sum but not the damping multiply. Integer fixed-point fixes
 * both, and 10^-12 resolution dwarfs PageRank's own convergence error
 * at any practical iteration count.)
 *
 * Scale shape (per iteration): ONE equi-join of the edge list with the
 * rank frame on the source id + ONE hash aggregation on the
 * destination id — both map-side-combined shuffles on bounded-width
 * integer rows (id, contribution); vectors/bodies never shuffle. The
 * out-degree rides the edge frame (joined once, before iterating), so
 * the loop is a pure pipeline over (src, dst, outdeg) triples. Ranks
 * overflow-safe: with damping numerator ≤ 100, total mass N·Scale
 * stays < 2^63/100 up to N ≈ 10^9 nodes at Scale = 10^12.
 */
object Graph {

  /** Fixed-point resolution: ranks are integers in units of 1e-12. */
  val Scale: Long = 1000000000000L

  /**
   * Fixed-iteration PageRank over a DIRECTED edge list (`srcCol`,
   * `dstCol`). Every node with at least one outgoing edge starts at
   * rank `Scale` (the "sum of ranks = N" convention) and updates as
   *
   *   r'(v) = (15·Scale) div 100  +  (85 · Σ_{u→v} (r(u) div out(u))) div 100
   *
   * for `iters` rounds over EVERY node of the graph (sources and pure
   * sinks alike — a node with no in-links keeps exactly the teleport
   * term; every node starts at rank `Scale`, the "sum of ranks = N"
   * convention) — all integer arithmetic, `div` truncating division.
   * Dangling mass (nodes with no out-edges) is not redistributed: they
   * accumulate rank but contribute none, the standard simplified
   * variant — callers wanting the strongly ergodic form symmetrize or
   * add back-edges first. Returns (id, rank_fp) with rank in
   * fixed-point units (divide by `Scale` for the conventional value).
   */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 3,
      // optional INTEGER edge-weight column: a node's rank splits over
      // its out-edges proportionally to weight — (r·w) div W(u) per
      // edge instead of r div out(u). Integer weights keep the whole
      // recurrence fixed-point-exact; overflow-safe while
      // max(w) · N · Scale < 2^63 (e.g. w ≤ 10^4 up to N ≈ 10^5 — at
      // larger products, pre-scale weights down).
      weightCol: Option[String] = None): DataFrame = {
    require(iters >= 1, "at least one iteration")
    val wCol = weightCol.map(c => col(c).cast("long"))
      .getOrElse(lit(1L))
    val e = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"),
      wCol.as("__w"))
    val deg = e.groupBy("__src").agg(sum(col("__w")).as("__wsum"))
    // out-weight attached ONCE; the loop never re-joins it
    val withDeg = e.join(deg, "__src")
    val nodes = e.select(col("__src").as("__id"))
      .union(e.select(col("__dst").as("__id"))).distinct()
    var ranks = nodes.withColumn("__pr", lit(Scale))
    for (_ <- 1 to iters) {
      val contrib = withDeg
        .join(ranks, col("__src") === col("__id"))
        .select(col("__dst"), expr("(__pr * __w) DIV __wsum").as("__c"))
        .groupBy(col("__dst"))
        .agg(sum(col("__c")).as("__s"))
      // left join keeps in-link-less nodes alive at the teleport term
      ranks = nodes
        .join(contrib, col("__id") === col("__dst"), "left")
        .select(col("__id"),
          expr(s"${15 * Scale / 100} + (85 * coalesce(__s, 0L)) DIV 100")
            .as("__pr"))
    }
    ranks.select(col("__id").as("id"), col("__pr").as("rank_fp"))
  }

  /**
   * Per-node triangle counts over an UNDIRECTED graph given as distinct
   * canonical pairs (`aCol` < `bCol` — the `Cooccur.pairs` shape): the
   * local clustering signal (a node's triangle count over its degree
   * pairs is its clustering coefficient), and the classic
   * skew-sensitive graph benchmark.
   *
   * Algorithm: DEGREE-ORDERED orientation (Latapy / "compact-forward";
   * public formulation also in Suri & Vassilvitskii, WWW'11 — the
   * MapReduce triangle-counting paper): each undirected edge {u,v} is
   * directed from the (degree, id)-smaller endpoint to the larger, then
   * triangles are wedges u→v, u→w (v < w by the same order) closed by
   * v→w. Every triangle has exactly one smallest vertex under the total
   * order, so it is enumerated exactly once — and because edges point
   * from low degree to high, every node's oriented out-degree is
   * O(√m) on any graph: the wedge self-join (the quadratic step) is
   * bounded by Σ outdeg² = O(m^1.5) instead of the Σ deg² blow-up a
   * naive id-ordering suffers when a hub lands at a small id. That
   * orientation IS the 100 TB design choice; the join itself is two
   * hash equi-joins on node ids (no cross product), and only (id, id)
   * pairs ever shuffle.
   *
   * Returns (id, n_triangles) for every node of the graph (0 for
   * triangle-free nodes). Deterministic integers — oracle-exact.
   */
  def triangles(pairs: DataFrame, aCol: String = "item_a",
      bCol: String = "item_b"): DataFrame = {
    val und = pairs.select(col(aCol).as("__a"), col(bCol).as("__b"))
    val deg = und.select(col("__a").as("__n"))
      .unionAll(und.select(col("__b").as("__n")))
      .groupBy("__n").agg(count(lit(1)).as("__d"))
    // orient by (degree, id): keep each edge once, low endpoint first
    val dA = deg.select(col("__n").as("__a"), col("__d").as("__da"))
    val dB = deg.select(col("__n").as("__b"), col("__d").as("__db"))
    val oriented = und.join(dA, "__a").join(dB, "__b")
      .select(
        when(col("__da") < col("__db") ||
          (col("__da") === col("__db") && col("__a") < col("__b")),
          struct(col("__a").as("src"), col("__b").as("dst")))
          .otherwise(struct(col("__b").as("src"), col("__a").as("dst")))
          .as("__e"))
      .select(col("__e.src").as("__src"), col("__e.dst").as("__dst"))
    // wedges from each source's oriented neighbor list (the two
    // endpoints id-normalized v < w), closed against the CANONICAL
    // undirected pair list — the input is already (a < b) canonical, so
    // the close is one hash equi-join on (v, w), never an OR-condition
    // nested loop
    val e1 = oriented.select(col("__src"), col("__dst").as("__v"))
    val e2 = oriented.select(col("__src"), col("__dst").as("__w"))
    val wedges = e1.join(e2, "__src").where(col("__v") < col("__w"))
    val closing = und.select(col("__a").as("__v"), col("__b").as("__w"))
    val tri = wedges.join(closing, Seq("__v", "__w"))
      .select(col("__src"), col("__v"), col("__w"))
    val nodes = deg.select(col("__n").as("id"))
    val perNode = tri
      .select(explode(array(col("__src"), col("__v"), col("__w"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("__t"))
    nodes.join(perNode, Seq("id"), "left")
      .select(col("id"), coalesce(col("__t"), lit(0L)).as("n_triangles"))
  }
}
