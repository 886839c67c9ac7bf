package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank-style authority scoring in EXACT integer arithmetic — the
  * domain-graph weighting step of web-corpus curation (authority of a
  * crawl domain, computed from the link/mirror graph, feeds sampling
  * weights). Classic double-valued PageRank cannot be value-oracled
  * across engines (sum order changes last-ulp results); this variant
  * propagates integer MASS with floor division so every round is
  * bit-exact on any engine and any partitioning, while converging to
  * the same authority ordering:
  *
  *   sent(u)  = ((mass(u) * dampNum) div dampDen) div outdeg(u)
  *   mass'(v) = mass(v) − sent(v)·outdeg(v) + Σ_{u→v} sent(u)
  *
  * i.e. each node pushes ~damp of its mass equally along its edges and
  * keeps the rest (the damping complement plus flooring residue), so
  * total mass is conserved EXACTLY every round — a checkable invariant
  * ([[GraphRankSpec]] asserts it).
  *
  * Scale shape: per round, one join of the state against the edge list
  * on the source key and one sum-by-destination — two narrow hash
  * shuffles of (node, long) rows, the Pregel iteration optimum; degree
  * is computed once. State crosses a [[Barrier]] per round so lineage
  * never replays prior rounds. Rounds are a small constant (authority
  * ranking stabilizes in a handful of iterations).
  */
object GraphRank {

  /** Run `rounds` mass-propagation rounds over the DIRECTED edge list
    * (symmetrize first for undirected graphs); every node in `nodes`
    * participates (isolated nodes keep their initial mass). Returns
    * (node, mass).
    *
    * PRECONDITION: edge endpoints must appear in `nodes` — mass sent
    * to an unknown destination has no state row to land in and would
    * leak (conservation is spec-asserted only over closed graphs). */
  def rank(
      nodes: DataFrame,
      nodeCol: String,
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      rounds: Int,
      scale: Long = 1000000L,
      dampNum: Long = 17L,
      dampDen: Long = 20L): DataFrame = {
    require(rounds >= 1 && scale > 0 && dampNum > 0 && dampDen >= dampNum,
      "bad rank parameters")
    val e = Barrier(
      edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct())
    val deg = Barrier(
      e.groupBy(col("src").as("node")).agg(count(lit(1)).as("outdeg")))
    var state = Barrier(
      nodes.select(col(nodeCol).as("node")).distinct()
        .withColumn("mass", lit(scale)))
    for (_ <- 1 to rounds) {
      val sending = state.join(deg, Seq("node"), "left")
        .selectExpr(
          "node", "mass",
          "coalesce(outdeg, 0L) AS outdeg",
          s"CASE WHEN outdeg IS NULL THEN 0L ELSE ((mass * ${dampNum}L) div ${dampDen}L) div outdeg END AS sent")
      val inflow = sending
        .join(e, sending("node") === e("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum("sent").as("inflow"))
      state = Barrier(
        sending.join(inflow, Seq("node"), "left")
          .selectExpr(
            "node",
            "mass - sent * outdeg + coalesce(inflow, 0L) AS mass"))
    }
    state
  }

  /** Mechanically-chained DuckDB rendition over CTEs `nodes(node)` and
    * `sym(src, dst)` supplied by the caller (the qp07 registration
    * builds them from the near-dup domain graph): same degree table,
    * same floor-division send, same conservation identity, one CTE
    * stage pair per round. */
  def oracleRoundsSql(
      rounds: Int,
      scale: Long = 1000000L,
      dampNum: Long = 17L,
      dampDen: Long = 20L): String = {
    val stages = (1 to rounds).map { i =>
      s"""snd_$i AS (SELECT m.node, m.mass, coalesce(d.outdeg, 0) AS outdeg,
         |             CASE WHEN d.outdeg IS NULL THEN 0
         |                  ELSE ((m.mass * $dampNum) // $dampDen) // d.outdeg END AS sent
         |           FROM m_${i - 1} m LEFT JOIN deg d ON m.node = d.node),
         |inf_$i AS (SELECT e.dst AS node, sum(s.sent) AS s
         |           FROM snd_$i s JOIN sym e ON s.node = e.src GROUP BY e.dst),
         |m_$i AS (SELECT s.node,
         |           s.mass - s.sent * s.outdeg + coalesce(i.s, 0) AS mass
         |         FROM snd_$i s LEFT JOIN inf_$i i ON s.node = i.node)""".stripMargin
    }
    s"""deg AS (SELECT src AS node, count(*) AS outdeg FROM sym GROUP BY src),
       |m_0 AS (SELECT node, CAST($scale AS BIGINT) AS mass FROM nodes),
       |${stages.mkString(",\n")}
       |SELECT node, CAST(mass AS BIGINT) AS mass FROM m_$rounds""".stripMargin
  }
}
