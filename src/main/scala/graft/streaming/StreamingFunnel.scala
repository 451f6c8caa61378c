package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming funnel-completion detection: emit one row per entity the
  * moment its ordered step sequence first becomes completable — the
  * streaming twin of `operators.Funnel.earliestCompletion` (the trigger
  * shape: "user finished onboarding", "pipeline stage chain closed").
  *
  * Semantics under out-of-order arrival: per-entity state retains the
  * MINIMUM step-1 time plus all later-step candidate times, and
  * re-evaluates the earliest-completion chain on every update — a greedy
  * single-pass state would lock in a wrong chain when an earlier step-1
  * event arrives late. Completion is monotone (more events never
  * un-complete a funnel), so the emitted SET equals the batch operator's
  * depth-k rows on any replay order (StreamingSpec proves set equality on
  * shuffled replay, and exact timestamp equality on in-order replay,
  * where first-completion chains are final).
  *
  * State bounds: one long for step 1; for steps >= 2 only times within
  * `(-inf, t1 + window]` are retained when a conversion window is given —
  * t1 only decreases, so a time past the window can never re-qualify and
  * is dropped permanently. State is removed on completion (emitted keys
  * cost nothing). Without a window, candidate lists grow with an
  * entity's step events — pass a window at ingest scale.
  */
object StreamingFunnel {

  final case class StepEvent(entity: Long, step: Int, ts: Long)
  final case class Completion(entity: Long, times: Seq[Long])
  final case class FunnelState(minStep1: Long, later: Map[Int, Seq[Long]],
      done: Boolean)

  /** Earliest-completion chain over retained state; None until complete. */
  private def evaluate(st: FunnelState, nSteps: Int,
      window: Option[Long]): Option[Seq[Long]] = {
    if (st.minStep1 == Long.MaxValue) return None
    val limit = window.map(st.minStep1 + _).getOrElse(Long.MaxValue)
    var times = List(st.minStep1)
    var prev = st.minStep1
    var i = 2
    while (i <= nSteps) {
      val candidates = st.later.getOrElse(i, Nil).filter(t => t > prev && t <= limit)
      if (candidates.isEmpty) return None
      prev = candidates.min
      times = prev :: times
      i += 1
    }
    Some(times.reverse)
  }

  /** @param events step events; `step` is the 1-based index in the funnel
    * @param nSteps funnel length
    * @param window optional conversion window (ts units) from step-1 time
    */
  def completions(events: Dataset[StepEvent], nSteps: Int,
      window: Option[Long] = None): Dataset[Completion] = {
    val spark = events.sparkSession
    import spark.implicits._
    require(nSteps >= 1)
    events
      .groupByKey(_.entity)
      .flatMapGroupsWithState[FunnelState, Completion](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (entity: Long, batch: Iterator[StepEvent], state: GroupState[FunnelState]) =>
          val prev = state.getOption
            .getOrElse(FunnelState(Long.MaxValue, Map.empty, done = false))
          if (prev.done) Iterator.empty
          else {
            var st = prev
            batch.foreach { e =>
              if (e.step == 1) {
                if (e.ts < st.minStep1) st = st.copy(minStep1 = e.ts)
              } else if (e.step >= 2 && e.step <= nSteps) {
                st = st.copy(later = st.later.updated(e.step,
                  e.ts +: st.later.getOrElse(e.step, Nil)))
              }
            }
            // permanent compaction: past-window times can never re-qualify
            val limit = window.map(st.minStep1 + _)
            limit.foreach { lim =>
              if (st.minStep1 != Long.MaxValue)
                st = st.copy(later =
                  st.later.map { case (k, v) => k -> v.filter(_ <= lim) })
            }
            evaluate(st, nSteps, window) match {
              case Some(times) =>
                state.update(st.copy(done = true, later = Map.empty))
                Iterator.single(Completion(entity, times))
              case None =>
                state.update(st)
                Iterator.empty
            }
          }
      }
  }
}
