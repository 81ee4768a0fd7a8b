package graft.queries

object TextQueries {
  val qs: Seq[Q] = Seq()
}
