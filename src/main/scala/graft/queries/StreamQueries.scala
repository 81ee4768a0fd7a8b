package graft.queries

object StreamQueries {
  val qs: Seq[Q] = Seq()
}
