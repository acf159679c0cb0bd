package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009) —
  * the standard score-free ensemble for combining retrieval rankings
  * (lexical BM25 + dense ANN, multiple indexes, multiple query
  * rewrites): each ranking contributes `1 / (kConst + rank)` for every
  * item it ranked; items missing from a ranking contribute exactly 0.
  * RRF needs no score calibration between the systems — only ranks —
  * which is why it is the default hybrid-retrieval combiner.
  *
  * Shape: one full-outer join chain over the (small, top-k-sized)
  * ranking frames — at 100 TB the rankings are already k·queries rows,
  * so fusion is never data-sized.
  *
  * Exactness: each contribution is ONE IEEE division of exact small
  * integers, and the fused score adds the per-ranking columns in FIXED
  * input order (absent = an exact 0.0), so both engines run the
  * identical chain — rank on the RAW fused score, round only for
  * output (the emb_top_pairs discipline).
  */
object Fusion {

  /** Fuse rankings — each frame carries (`idCol`, `rankCol` with dense
    * 1-based integer ranks). Output: (`idCol`, rrf) over the UNION of
    * ranked items.
    */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String, rankCol: String,
              kConst: Int = 60): DataFrame = {
    require(rankings.size >= 2, s"need >= 2 rankings, got ${rankings.size}")
    require(kConst >= 1, s"kConst must be >= 1, got $kConst")
    val scored = rankings.zipWithIndex.map { case (r, i) =>
      r.select(col(idCol),
        (lit(1.0) / (lit(kConst.toDouble) + col(rankCol).cast("double")))
          .as(s"_r$i"))
    }
    scored.reduce((a, b) => a.join(b, Seq(idCol), "full_outer"))
      .select(col(idCol),
        rankings.indices
          .map(i => coalesce(col(s"_r$i"), lit(0.0)))
          .reduce(_ + _).as("rrf"))
  }
}
