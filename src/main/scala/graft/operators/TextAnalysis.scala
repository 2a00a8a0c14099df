package graft.operators

import graft.Q

object TextAnalysis {
  val queries: Seq[Q] = Seq()
}
