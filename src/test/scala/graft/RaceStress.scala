package graft

/** Opt-in stress multiplier for the lock/ledger race specs (round-17
  * verdict, What's missing #1): the adoption steal fired roughly once
  * per N FULL suites — the default scheduler only catches what it
  * happens to interleave. `SPARK_GRAFT_RACE_STRESS=30` repeats each
  * wrapped spec body 30x with [[graft.operators.FsLock]]'s adoption
  * window widened by a short deterministically-seeded random sleep,
  * so the contender/adopter interleavings that otherwise need machine
  * load are explored on every run; default 1 keeps the suite fast. */
object RaceStress {
  val n: Int =
    sys.env.get("SPARK_GRAFT_RACE_STRESS").flatMap(s =>
      scala.util.Try(s.trim.toInt).toOption).filter(_ > 0).getOrElse(1)

  /** Repeat `body` n times under the widened adoption window;
    * failures name the iteration that fired. */
  def loop(body: => Unit): Unit =
    (1 to n).foreach { it =>
      if (n > 1) {
        val rnd = new java.util.Random(it.toLong)
        graft.operators.FsLock.adoptionRaceWindow =
          _ => Thread.sleep(rnd.nextInt(8).toLong)
      }
      try body
      catch {
        case t: Throwable if n > 1 =>
          throw new AssertionError(
            s"stress iteration $it/$n: ${t.getMessage}", t)
      } finally graft.operators.FsLock.adoptionRaceWindow = _ => ()
    }
}
