package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.sqrt

/** Shared vector math for the embedding operators (AnnIndex, Pq, SemDedup,
  * SimilarityJoin) and the query layer. Lives in the operators layer so that
  * queries compose operators, never the reverse.
  */
object VectorMath {

  /** Cosine similarity between two array<float|double> columns, computed in
    * double with sequential accumulation (deterministic order ⇒ reproducible
    * bit pattern). Uses the codegen VecDot expression — the equivalent
    * aggregate(zip_with(...)) runs interpreted (HOFs don't codegen) and is
    * ~5× slower on all-pairs workloads.
    */
  def cosine(a: Column, b: Column): Column = {
    import graft.functions.VecDot.vec_dot
    vec_dot(a, b) / (sqrt(vec_dot(a, a)) * sqrt(vec_dot(b, b)))
  }
}
