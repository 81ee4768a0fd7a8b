package graft.queries

object SimilarityQueries {
  val qs: Seq[Q] = Seq()
}
