package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ranking-quality evaluation — the metric layer a retrieval stack (BM25,
  * ANN, RRF fusion) is judged by: nDCG@k (Järvelin & Kekäläinen 2002),
  * reciprocal rank, precision/recall@k, and AP@k (precision-at-hit over
  * min(n_rel, k) — the MAP constituent), per query id. Runs AFTER the
  * rankers, on rank LISTS + a relevance table — never data-sized frames:
  * at 100 TB the eval cost is |queries|·k rows, independent of the
  * corpus.
  *
  * Contracts: `ranked` carries (qid, id, rank) with rank 1-based and
  * unique per qid (rows past `k` are ignored); `relevant` carries
  * (qid, id, gain > 0) — duplicate (qid, id) rows collapse to max gain
  * (deterministic). Unjudged ranked items gain 0 (the standard
  * convention). IDCG uses the ideal top-k of the FULL judged set ordered
  * (gain DESC, id ASC) — a deterministic total order. A query with no
  * judged items at all yields NULL recall/ndcg (0/0 guarded), rr = 0 when
  * nothing relevant is ranked. Float outputs are round-6; the DCG/AP
  * sums run over ≤ k terms of gain/log2(rank+1) folded in FIXED
  * rank-ascending order (sort_array over collect_list + a sequential
  * `aggregate` fold — never a plain float `sum`, whose partial-agg
  * association Spark may vary by layout; the round-13 q45 red proved an
  * order-exposed pre-round double is one engine change away from a hash
  * mismatch). The oracle replays the identical left fold via
  * `list_aggregate(list(term ORDER BY rank), 'sum')`.
  */
object RankEval {

  def rankEval(ranked: DataFrame, relevant: DataFrame, qidCol: String,
               idCol: String, rankCol: String, gainCol: String,
               k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // sequential left fold in ascending-rank struct order: the
    // association is fixed by construction, identical in both engines
    // and under any partition layout (the HOF runs interpreted, but only
    // on <= k terms per query — never a data-sized frame)
    def foldT(terms: org.apache.spark.sql.Column) =
      aggregate(sort_array(terms), lit(0.0),
        (acc, x) => acc + x.getField("t"))
    val rel = relevant
      .select(col(qidCol).as("qid"), col(idCol).as("id"),
        col(gainCol).cast("double").as("gain"))
      .filter(col("gain") > 0.0)
      .groupBy(col("qid"), col("id"))
      .agg(max(col("gain")).as("gain"))
      .localCheckpoint(true) // consumed by the list join AND the ideal side
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("rank"))
    val lst = ranked
      .select(col(qidCol).as("qid"), col(idCol).as("id"),
        col(rankCol).cast("long").as("rank"))
      .filter(col("rank") >= 1L && col("rank") <= k)
      .join(rel, Seq("qid", "id"), "left")
      // running hit count for AP: the window sees <= k rows per qid
      .withColumn("hr", count(when(col("gain").isNotNull, 1)).over(w))
      .groupBy(col("qid"))
      .agg(
        count(lit(1)).as("n_ranked"),
        count(when(col("gain").isNotNull, 1)).as("hits"),
        // collect (rank, term) structs; the fixed-order fold happens
        // below (collect_list drops the NULL structs of non-hit rows)
        collect_list(struct(col("rank").as("r"),
          (coalesce(col("gain"), lit(0.0)) /
            log2(col("rank").cast("double") + 1.0)).as("t"))).as("_dcg_ts"),
        min(when(col("gain").isNotNull, col("rank"))).as("first_hit"),
        collect_list(when(col("gain").isNotNull,
          struct(col("rank").as("r"),
            (col("hr").cast("double") / col("rank").cast("double"))
              .as("t")))).as("_ap_ts"))
      .withColumn("dcg_raw", foldT(col("_dcg_ts")))
      .withColumn("ap_num", foldT(col("_ap_ts")))
      .drop("_dcg_ts", "_ap_ts")
    val ideal = rel
      .withColumn("irank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("qid"))
          .orderBy(col("gain").desc, col("id").asc)))
      .groupBy(col("qid"))
      .agg(count(lit(1)).as("n_rel"),
        collect_list(when(col("irank") <= k,
          struct(col("irank").as("r"),
            (col("gain") / log2(col("irank").cast("double") + 1.0))
              .as("t")))).as("_idcg_ts"))
      .withColumn("idcg_raw", foldT(col("_idcg_ts")))
      .drop("_idcg_ts")
    lst.join(ideal, Seq("qid"), "full")
      .select(col("qid"),
        coalesce(col("n_ranked"), lit(0L)).as("n_ranked"),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        round(coalesce(col("hits"), lit(0L)).cast("double") / k, 6)
          .as("precision"),
        when(col("n_rel") > 0L,
          round(coalesce(col("hits"), lit(0L)).cast("double") /
            col("n_rel").cast("double"), 6)).as("recall"),
        round(coalesce(lit(1.0) / col("first_hit").cast("double"),
          lit(0.0)), 6).as("rr"),
        when(col("n_rel") > 0L && col("idcg_raw") > 0.0,
          round(coalesce(col("dcg_raw"), lit(0.0)) / col("idcg_raw"), 6))
          .as("ndcg"),
        // AP@k: mean precision-at-hit over min(n_rel, k) — the MAP
        // constituent (per-hit running precision, a <= k-row window)
        when(col("n_rel") > 0L,
          round(coalesce(col("ap_num"), lit(0.0)) /
            least(col("n_rel"), lit(k.toLong)).cast("double"), 6)).as("ap"))
  }
}
