package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench baseline-merge policy (the drift detector's memory). The
  * property the round-13 verdict demanded: a CONTENDED full-suite run
  * followed by a clean one must leave the baseline at the clean values —
  * the old policy protected only rows already flagged as drifted, so a
  * row inflated <2x under load silently ratcheted the bar for every
  * later round. */
class BenchSpec extends AnyFunSuite {

  private val clean = Map(
    "q_batch" -> (1.0, 3000L),
    "q_stream_x" -> (2.0, 3000L))

  test("contended-then-clean run pair leaves the baseline at clean values") {
    // Contended run: everything inflated 1.9x (below the 2x drift flag —
    // exactly the rows the old policy ratcheted).
    val contended = Seq(("q_batch", 1.9, 5700L), ("q_stream_x", 3.8, 5700L))
    val afterBad = Bench.mergePrior(contended, clean, accept = false)
      .map { case (k, w, c) => k -> (w, c) }.toMap
    // Wall AND cpu held at the clean prior for both rows — the baseline
    // is uniformly the cleanest-host measurement, no latest-run column.
    assert(afterBad("q_batch") == ((1.0, 3000L)),
      "batch row ratcheted under load")
    assert(afterBad("q_stream_x") == ((2.0, 3000L)),
      "streaming row ratcheted under load")
    // Clean run on the (possibly load-written) baseline: values converge
    // back to clean — nothing was lost to the contended round.
    val clean2 = Seq(("q_batch", 1.0, 3000L), ("q_stream_x", 2.0, 3000L))
    val afterGood = Bench.mergePrior(clean2, afterBad, accept = false)
      .map { case (k, w, c) => k -> (w, c) }.toMap
    assert(afterGood == Map(
      "q_batch" -> ((1.0, 3000L)), "q_stream_x" -> ((2.0, 3000L))))
  }

  test("baseline only tightens: a faster clean run lowers it") {
    val faster = Seq(("q_batch", 0.8, 2400L), ("q_stream_x", 1.5, 2500L))
    val out = Bench.mergePrior(faster, clean, accept = false)
      .map { case (k, w, c) => k -> (w, c) }.toMap
    assert(out("q_batch") == ((0.8, 2400L)))
    assert(out("q_stream_x") == ((1.5, 2500L)))
  }

  test("accept re-seeds the baseline after an intentional plan change") {
    val regressed = Seq(("q_batch", 3.0, 9000L), ("q_stream_x", 6.0, 9000L))
    val out = Bench.mergePrior(regressed, clean, accept = true)
      .map { case (k, w, c) => k -> (w, c) }.toMap
    assert(out("q_batch") == ((3.0, 9000L)))
    assert(out("q_stream_x") == ((6.0, 9000L)))
  }

  test("rows absent from the prior seed at their measured values") {
    val out = Bench.mergePrior(Seq(("q_new", 1.2, 1000L)), clean, accept = false)
    assert(out.contains(("q_new", 1.2, 1000L)))
  }

  test("an errored round carries the absent query's prior row forward") {
    // q_stream_x errored this round (absent from the run); its clean-host
    // baseline must survive verbatim — dropping it would let the NEXT
    // round re-seed it at contended values, the single-transient-failure
    // ratchet vector the carry-forward closes.
    val out = Bench.mergePrior(Seq(("q_batch", 1.1, 3100L)), clean,
      accept = false)
    assert(out.toSet == Set(("q_batch", 1.0, 3000L), ("q_stream_x", 2.0, 3000L)))
    // accept re-seeds only MEASURED rows; absent rows still carry forward
    // (there is nothing measured to accept for them).
    val accepted = Bench.mergePrior(Seq(("q_batch", 3.0, 9000L)), clean,
      accept = true)
    assert(accepted.toSet ==
      Set(("q_batch", 3.0, 9000L), ("q_stream_x", 2.0, 3000L)))
  }

  test("accept purges prior rows whose queries left the registry, and " +
      "only those") {
    // q_stream_x was renamed/retired (not in the registry). A plain run
    // still carries it (a transient error must not erase clean-host
    // memory), but the accept escape hatch — the one intentional-change
    // mechanism — is where a dead row can finally leave the baseline.
    val registry = Set("q_batch")
    val plain = Bench.mergePrior(Seq(("q_batch", 1.1, 3100L)), clean,
      accept = false, registry)
    assert(plain.toSet ==
      Set(("q_batch", 1.0, 3000L), ("q_stream_x", 2.0, 3000L)),
      "a non-accept run must keep carrying the retired row")
    val accepted = Bench.mergePrior(Seq(("q_batch", 1.1, 3100L)), clean,
      accept = true, registry)
    assert(accepted.toSet == Set(("q_batch", 1.1, 3100L)),
      "accept must purge rows that left the registry")
    // An in-registry row absent from an accept run (transient error
    // during the accept round) still carries forward.
    val acceptedErr = Bench.mergePrior(Seq.empty, clean, accept = true,
      Set("q_batch", "q_stream_x"))
    assert(acceptedErr.toSet == clean.map { case (k, (w, c)) => (k, w, c) }.toSet)
  }
}
