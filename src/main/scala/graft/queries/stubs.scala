package graft.queries

/** Placeholder groups — filled in as the extension operators land. */
object TextQueries { val all: Seq[Q] = Seq.empty }
object EventQueries { val all: Seq[Q] = Seq.empty }
