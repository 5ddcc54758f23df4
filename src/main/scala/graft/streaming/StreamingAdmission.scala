package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming token-budget admission — ingest-side budget control: each
  * source's token LEDGER lives in keyed state, and a document is
  * admitted iff the tokens already admitted for its source are below
  * the source's budget (same floor rule as
  * [[graft.ext.Sampling.tokenBudget]]: the crossing document is the
  * last one in).
  *
  * Contract: WITHIN a micro-batch documents admit in the deterministic
  * (hash, id) order of the batch operator, so a single-batch stream is
  * row-identical to [[graft.ext.Sampling.tokenBudget]] (spec-asserted).
  * ACROSS batches admission is necessarily arrival-ordered — a
  * streaming admission cannot reorder against documents it has not
  * seen — so the multi-batch guarantees are the ledger invariants
  * (admitted sets only grow; the ledger exceeds the budget by at most
  * the final crossing document), not batch-equality. State per source
  * is ONE counter: bounded regardless of stream length.
  */
object StreamingAdmission {

  case class DocTok(source: String, id: Long, n_tokens: Long)
  case class Ledger(used: Long)

  private def h(id: Long): Long = {
    val p = graft.ext.Sampling.HashPrime
    val hv = ((id % p) * graft.ext.Sampling.HashMult) % p
    if (hv < 0) hv + p else hv
  }

  def update(budget: String => Long)(source: String,
      docs: Iterator[DocTok], state: GroupState[Ledger])
      : Iterator[DocTok] = {
    val b = budget(source)
    var used = state.getOption.map(_.used).getOrElse(0L)
    val admitted = docs.toSeq.sortBy(d => (h(d.id), d.id)).filter { d =>
      val in = used < b
      if (in) used += d.n_tokens
      in
    }
    state.update(Ledger(used))
    admitted.iterator
  }

  /** Wire the admission operator onto a stream of [[DocTok]]s. */
  def run(docs: Dataset[DocTok], budget: String => Long)
      : Dataset[DocTok] = {
    implicit val outEnc = Encoders.product[DocTok]
    implicit val stateEnc = Encoders.product[Ledger]
    docs.groupByKey(_.source)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update(budget))
  }
}
