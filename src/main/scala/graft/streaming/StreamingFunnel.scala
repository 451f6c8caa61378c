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
  * event arrives late.
  *
  * Equality-with-batch guarantee, precisely scoped:
  *  - WITHOUT a conversion window, completion is monotone (more events
  *    never un-complete a funnel), so the emitted set equals the batch
  *    operator's depth-k rows on ANY replay order.
  *  - WITH a conversion window, the guarantee additionally requires that
  *    an entity's step-1 time is FINAL by the time its later steps
  *    complete the chain (bounded lateness — enforce with a watermark
  *    upstream). Under unbounded lateness a late-arriving EARLIER step-1
  *    event shrinks the window `(t1, t1 + window]` and can invalidate an
  *    already-emitted completion: e.g. steps at 100/150/200 with
  *    window=100 complete, then a late step-1 at 0 makes the batch
  *    operator report depth 1. Streaming output is append-only and
  *    cannot retract — StreamingSpec pins this divergence adversarially.
  *
  * State bounds (O(active window), not O(history)): one long for step 1;
  * for steps >= 2 only times within `(-inf, t1 + window]` are retained
  * when a conversion window is given — t1 only decreases, so a time past
  * the window can never re-qualify and is dropped permanently. Before any
  * step-1 arrives, candidates at or below the current event-time
  * watermark are evicted when the input stream carries one (every future
  * step-1 has `t1 >= watermark`, and a candidate must be strictly after
  * its step-1 to pair, so `t <= watermark` is dead). State is removed on
  * completion (emitted keys cost nothing). Without a window or watermark,
  * candidate lists grow with an entity's step events — pass both at
  * ingest scale.
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

  /** One state transition: fold a batch of events into the state, compact,
    * evaluate. Pure — extracted from the streaming body so the state-size
    * bounds are directly testable (StreamingSpec). `watermark` is the
    * current event-time watermark in `ts` units (Long.MinValue = none). */
  private[graft] def applyBatch(prev: FunnelState, batch: Iterator[StepEvent],
      nSteps: Int, window: Option[Long],
      watermark: Long): (FunnelState, Option[Seq[Long]]) = {
    var st = prev
    batch.foreach { e =>
      if (e.step == 1) {
        if (e.ts < st.minStep1) st = st.copy(minStep1 = e.ts)
      } else if (e.step >= 2 && e.step <= nSteps) {
        st = st.copy(later = st.later.updated(e.step,
          e.ts +: st.later.getOrElse(e.step, Nil)))
      }
    }
    if (st.minStep1 != Long.MaxValue) {
      // permanent compaction: past-window times can never re-qualify
      window.foreach { w =>
        val lim = st.minStep1 + w
        st = st.copy(later = st.later.map { case (k, v) => k -> v.filter(_ <= lim) })
      }
    } else if (watermark != Long.MinValue) {
      // no step 1 yet: every future step-1 has t1 >= watermark and a
      // candidate must be strictly after its step-1, so t <= watermark is
      // dead weight (late-data horizon eviction)
      st = st.copy(later = st.later.map { case (k, v) => k -> v.filter(_ > watermark) })
    }
    evaluate(st, nSteps, window) match {
      case Some(times) => (st.copy(done = true, later = Map.empty), Some(times))
      case None => (st, None)
    }
  }

  /** @param events step events; `step` is the 1-based index in the funnel
    * @param nSteps funnel length
    * @param window optional conversion window (ts units) from step-1 time
    *
    * If the input carries an event-time watermark whose column is `ts`
    * expressed as epoch millis, pre-step-1 state is additionally bounded
    * by the watermark horizon (see object Scaladoc).
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
            val wm = scala.util.Try(state.getCurrentWatermarkMs())
              .toOption.filter(_ > 0).getOrElse(Long.MinValue)
            val (st, completed) = applyBatch(prev, batch, nSteps, window, wm)
            state.update(st)
            completed match {
              case Some(times) => Iterator.single(Completion(entity, times))
              case None => Iterator.empty
            }
          }
      }
  }
}
