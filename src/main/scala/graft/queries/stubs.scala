package graft.queries

/** Placeholder groups — filled in as the extension operators land. */
object EventQueries { val all: Seq[Q] = Seq.empty }
