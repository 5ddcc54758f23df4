package graft.ingest

/** Driver-side ingestion scheduler — the engine-side model of the
  * reference's extract loop: one fetch per `intervalMillis` (20 s,
  * reference: extract.rkt:112-114), auth/session refresh every
  * `refreshEveryMillis` (1800 s, reference: extract.rkt:116-117;
  * extract.2023-11-16.rkt:256-258), per-task failure isolation (a failed
  * symbol is recorded, not fatal — reference handler at
  * extract.2023-11-16.rkt:250-265).
  *
  * Clock and sleep are injected so the cadence is unit-testable without
  * wall-clock time; the engine consumes the files this produces (S1),
  * so HTTP itself stays out of the library.
  */
class RateLimitedScheduler(
    intervalMillis: Long,
    refreshEveryMillis: Long,
    clock: () => Long = () => System.currentTimeMillis(),
    sleep: Long => Unit = Thread.sleep) {

  case class Result[A](symbol: String, outcome: Either[Throwable, A])

  /** Run `fetch` once per symbol at the configured spacing, invoking
    * `refresh` whenever a refresh period boundary is crossed (including
    * before the first fetch, like the reference's modulo-0 check). */
  def run[A](symbols: Seq[String], refresh: () => Unit, fetch: String => A)
      : Seq[Result[A]] = {
    val start = clock()
    var lastRefreshPeriod = -1L
    symbols.zipWithIndex.map { case (sym, i) =>
      val due = start + i * intervalMillis
      val now = clock()
      if (due > now) sleep(due - now)
      val period = (clock() - start) / refreshEveryMillis
      if (period != lastRefreshPeriod) {
        lastRefreshPeriod = period
        refresh()
      }
      Result(sym,
        try Right(fetch(sym))
        // NonFatal only: OOM/InterruptedException must abort the run,
        // not masquerade as a per-symbol fetch failure
        catch { case scala.util.control.NonFatal(e) => Left(e) })
    }
  }
}
