package graft.queries

object AggQueries {
  val qs: Seq[Q] = Seq()
}
