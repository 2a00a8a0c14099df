package graft.streaming

import graft.Q

object EventWindows {
  val queries: Seq[Q] = Seq()
}
