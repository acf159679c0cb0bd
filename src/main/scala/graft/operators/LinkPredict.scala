package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Neighborhood-based link prediction and graph-structure audit — the
  * classic "which edges are missing / how healthy is this graph" surface
  * beside the spectral family (PageRank/HITS) and the traversal family
  * (BFS/SSSP): common-neighbor counts, Jaccard overlap, Adamic-Adar
  * (2003) and resource-allocation (Zhou et al. 2009) scores for 2-hop
  * candidate pairs, plus degree assortativity (Newman 2002) as the one-row
  * structural audit. Link prediction is the standard crawl-frontier /
  * citation-recommendation / entity-graph-completion primitive a
  * link-quality pipeline runs next to PageRank.
  *
  * Scale shape: candidate pairs come from the distance-2 join (edges ⋈
  * edges on the shared middle), whose cost is Σ_z deg(z)² — unbounded hubs
  * make it quadratic, so middles are degree-capped (`maxMiddleDegree`),
  * the standard practice: a hub's Adamic-Adar contribution 1/ln(deg) is
  * vanishing anyway, and the cap turns the worst key's fanout into a
  * constant (deg² ≤ cap² rows per middle — no salting needed, AQE handles
  * the residual spread). The degree frames are node-sized, orders below
  * the edge list. Everything else is exact integer arithmetic; the two
  * float scores follow the round-6 ln discipline.
  */
object LinkPredict {

  /** 2-hop candidate pairs (a < b) with the four classic neighborhood
    * scores: `cn` (shared qualified middles, exact BIGINT), `jc` =
    * cn / (deg(a) + deg(b) − cn) (one division of exact integers —
    * deterministic), `aa` = Σ_z 1/ln(deg z), `ra` = Σ_z 1/deg z (float
    * sums — round-6, the ln discipline). Edges follow src→dst; pass a
    * symmetrized list for undirected semantics (the kCore contract).
    * Middles need deg ≥ 2 to connect two distinct neighbors, so
    * 1/ln(deg) never divides by zero; middles above `maxMiddleDegree`
    * are excluded from cn/aa/ra (documented estimator bias — the cap is
    * what bounds the distance-2 join at 100 TB), while `jc`'s endpoint
    * degrees stay UNCAPPED (they come from the node-sized degree frame,
    * not the pair join).
    */
  def neighborScores(edges: DataFrame, srcCol: String, dstCol: String,
                     maxMiddleDegree: Int = 64): DataFrame = {
    require(maxMiddleDegree >= 2,
      s"maxMiddleDegree must be >= 2, got $maxMiddleDegree")
    val e = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint(true)
    val deg = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg"))
    val mids = e.join(
      deg.filter(col("deg") <= maxMiddleDegree && col("deg") >= 2)
        .withColumnRenamed("node", "src"),
      Seq("src"))
    val pairs = mids.select(col("src").as("z"), col("dst").as("a"),
        col("deg").as("zdeg"))
      .join(mids.select(col("src").as("z"), col("dst").as("b")), Seq("z"))
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("cn"),
        sum(lit(1.0) / log(col("zdeg").cast("double"))).as("aa_raw"),
        sum(lit(1.0) / col("zdeg").cast("double")).as("ra_raw"))
    pairs
      .join(deg.select(col("node").as("a"), col("deg").as("dega")), Seq("a"))
      .join(deg.select(col("node").as("b"), col("deg").as("degb")), Seq("b"))
      .select(col("a"), col("b"), col("cn"),
        round(col("cn").cast("double") /
          (col("dega") + col("degb") - col("cn")).cast("double"), 6).as("jc"),
        round(col("aa_raw"), 6).as("aa"),
        round(col("ra_raw"), 6).as("ra"))
  }

  /** Degree assortativity (Newman 2002): the Pearson correlation of
    * (deg src, deg dst) over the directed edge list — one row
    * `(edges, r)`. Positive = hubs link hubs (social graphs), negative =
    * hubs link leaves (web/biology); the single most-quoted structural
    * audit number after the degree distribution itself.
    *
    * Exactness: all five moment sums are exact DECIMAL(38,0) integer
    * arithmetic (degrees are BIGINT counts; Σ deg·deg over any edge
    * count fits 38 digits), the numerator/variances are exact integer
    * differences of those, and only the FINAL sqrt/divide crosses into
    * double — one deterministic IEEE expression in both engines,
    * round-6 output. Degenerate graphs (zero variance on either side —
    * e.g. a perfect cycle) return r = NULL rather than 0/0.
    *
    * Input contract (the neighborScores/kCore rule): pass a SYMMETRIZED
    * edge list for undirected semantics. Degrees are OUT-degrees built
    * from the src side and inner-joined on dst, so on a genuinely
    * directed list an edge whose dst has no out-edges is silently
    * dropped — only symmetrized input (where out-degree = degree and
    * every dst is also a src) makes the Newman coefficient exact.
    */
  def degreeAssortativity(edges: DataFrame, srcCol: String,
                          dstCol: String): DataFrame = {
    val e = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint(true)
    val deg = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg"))
    val d38 = "decimal(38,0)"
    val xy = e
      .join(deg.select(col("node").as("src"), col("deg").as("x")), Seq("src"))
      .join(deg.select(col("node").as("dst"), col("deg").as("y")), Seq("dst"))
      .select(col("x").cast(d38).as("x"), col("y").cast(d38).as("y"))
    xy.agg(
        count(lit(1)).as("edges"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("edges"),
        (col("edges").cast(d38) * col("sxy") - col("sx") * col("sy"))
          .cast("double").as("num"),
        (col("edges").cast(d38) * col("sxx") - col("sx") * col("sx"))
          .cast("double").as("vx"),
        (col("edges").cast(d38) * col("syy") - col("sy") * col("sy"))
          .cast("double").as("vy"))
      .select(col("edges"),
        when(col("vx") > 0.0 && col("vy") > 0.0,
          round(col("num") / sqrt(col("vx") * col("vy")), 6)).as("r"))
  }
}
