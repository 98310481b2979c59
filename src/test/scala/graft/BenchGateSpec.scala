package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench iteration gate is what decides whether an official BENCH
  * number is evidence about the plan or about a co-tenant — it has to be
  * right on both axes (CPU loadavg AND disk-write throughput), so the
  * pure decision function gets direct coverage here. Calibration
  * context: the r9 official artifact recorded a 347→84 MB/s write
  * collapse whose iterations all passed the CPU-only gate while running
  * 3–10× slow (q23: 9.29 s official vs 0.89 s idle).
  */
class BenchGateSpec extends AnyFunSuite {

  private val g = Bench.LoadGate

  test("CPU axis: iterations over the load gate at start OR end are unclean") {
    assert(Bench.iterClean(1.0, g - 1, g - 1, 300.0, 350.0))
    assert(!Bench.iterClean(1.0, g + 1, g - 1, 300.0, 350.0))
    assert(!Bench.iterClean(1.0, g - 1, g + 1, 300.0, 350.0))
  }

  test("I/O axis: a collapsed write probe marks the iteration unclean") {
    // r9 signature: reference ~347 MB/s, collapse window ~84 MB/s — the
    // CPU gate passed these; the I/O axis must not
    assert(!Bench.iterClean(1.0, g - 1, g - 1, 84.2, 346.9))
    // healthy jitter (±25%) stays clean at the half-reference gate
    assert(Bench.iterClean(1.0, g - 1, g - 1, 260.0, 346.9))
    assert(Bench.iterClean(1.0, g - 1, g - 1, 346.9 * Bench.IoGateFrac, 346.9))
  }

  test("missing signals pass their axis; failures are never clean") {
    // probe unavailable (-1) or no reference yet → no I/O gating signal
    assert(Bench.iterClean(1.0, g - 1, g - 1, -1.0, 350.0))
    assert(Bench.iterClean(1.0, g - 1, g - 1, 300.0, -1.0))
    // a failed iteration (sec = -1 sentinel) is unclean regardless
    assert(!Bench.iterClean(-1.0, 0.0, 0.0, 350.0, 350.0))
  }

  test("write probe returns a positive throughput on this box") {
    val w = Bench.diskWriteMbps(Bench.IterProbeMb)
    assert(w > 0, s"probe failed: $w")
  }

  test("steal axis: hypervisor-contended iterations are unclean; no signal passes") {
    // round-12 calibration: a host co-tenant measured 10–22% steal while
    // loadavg sat at 2 and the write probe read healthy — streaming
    // entries ran 4–6× slow with zero signal on the first two axes
    assert(!Bench.iterClean(1.0, g - 1, g - 1, 300.0, 350.0, 0.15))
    assert(Bench.iterClean(1.0, g - 1, g - 1, 300.0, 350.0, 0.02))
    assert(Bench.iterClean(1.0, g - 1, g - 1, 300.0, 350.0, -1.0))
    // the jiffies reader yields a usable sample on this box, and the
    // fraction of two ordered samples is within [0, 1]
    val a = Bench.cpuJiffies()
    Thread.sleep(60)
    val b = Bench.cpuJiffies()
    assert(a._1 >= 0 && a._2 > 0, s"no /proc/stat signal: $a")
    val f = Bench.stealFrac(a, b)
    assert(f >= 0.0 && f <= 1.0, s"steal fraction out of range: $f")
  }

  test("published min is min-of-warm; cleanliness corroborates, never selects") {
    // Contention can only INFLATE an iteration — the min over warm
    // iterations is the tightest upper bound on the plan's cost, and a
    // clean iteration within CorroborationSlack of it certifies the
    // rate was demonstrated in a quiet window.
    // r12 signature: every base iteration contended (q58 9.95 s) while
    // the plan's clean time is 0.28 s — once a retry lands clean, the
    // headline is the warm min, corroborated
    val (sec, clean, n) = Bench.publishedMin(
      Seq(9.95, 10.2, 11.0, 0.31, 0.28), Seq(false, false, false, true, true))
    assert(sec == 0.28 && clean && n == 2)
    // no clean iteration within budget → still the warm min, but
    // flagged uncorroborated (the number may carry contention tax)
    val (sec2, clean2, n2) = Bench.publishedMin(
      Seq(9.95, 10.2), Seq(false, false))
    assert(sec2 == 10.2 && !clean2 && n2 == 0)
    // single-iteration degenerate: nothing warm to prefer
    val (sec2b, clean2b, _) = Bench.publishedMin(Seq(9.95), Seq(false))
    assert(sec2b == 9.95 && !clean2b)
    // a faster warm iteration IS published even when only a slower one
    // is clean — but the slower clean one cannot corroborate it (r14
    // q87 signature inverted: under min-of-clean-warm a consistent
    // 0.82–0.92 s warm band was discarded for a 4.83 s clean cold run)
    val (sec3, clean3, _) = Bench.publishedMin(
      Seq(1.0, 0.20, 0.60), Seq(false, false, true))
    assert(sec3 == 0.20 && !clean3)
    // clean within the slack → corroborated
    val (sec3b, clean3b, _) = Bench.publishedMin(
      Seq(1.0, 0.80, 0.85), Seq(false, false, true))
    assert(sec3b == 0.80 && clean3b)
    // any failure is the sentinel regardless of clean flags
    val (sec4, clean4, n4) = Bench.publishedMin(
      Seq(-1.0, 0.30), Seq(false, true))
    assert(sec4 == -1.0 && clean4 && n4 == 0)
  }

  test("published min never reports the cold first run when warm ones exist") {
    // r13 signature (q61): iteration 0 is the once-per-JVM layout BUILD
    // (4.30 s, gate-clean because the box was quiet); the headline must
    // be the warm rate regardless of which iterations were clean
    val (sec, clean, n) = Bench.publishedMin(
      Seq(4.30, 0.55, 0.53), Seq(true, true, true))
    assert(sec == 0.53 && clean && n == 3)
    // cold-clean + warm-contended: publish the warm rate, flagged
    // uncorroborated — the 4.30 s build corroborates nothing at 0.55 s
    val (sec2, clean2, n2) = Bench.publishedMin(
      Seq(4.30, 0.55), Seq(true, false))
    assert(sec2 == 0.55 && !clean2 && n2 == 1)
    // a clean COLD iteration at the same rate as the warm min DOES
    // corroborate (no layout build: iteration 0 samples the plan too)
    val (sec3, clean3, _) = Bench.publishedMin(
      Seq(0.84, 0.82, 1.9), Seq(true, false, false))
    assert(sec3 == 0.82 && clean3)
  }

  test("robust I/O reference: p75-of-probes, seed-anchored, spike-immune") {
    // one lucky 466 MB/s page-cache spike must not reclassify a healthy
    // ~220 MB/s steady state as collapsed (r14 baseline-run signature:
    // 60 entries flagged, 150 retries burned on probe noise)
    val probes = Seq(220.0, 466.0, 210.0, 230.0, 215.0, 225.0, 218.0)
    val ref = Bench.robustRef(322.6, probes)
    assert(ref <= 322.6, s"spike leaked into the reference: $ref")
    assert(Bench.iterClean(1.0, 1.0, 1.0, 215.0, ref))
    // the seeded baseline still anchors a run that STARTS collapsed
    // (r11: every probe <= 117 MB/s must not self-normalize)
    val ref2 = Bench.robustRef(322.6, Seq(117.0, 110.0, 95.0))
    assert(ref2 == 322.6 && !Bench.iterClean(1.0, 1.0, 1.0, 117.0, ref2))
    // no seed → p75 of the run's own probes
    val ref3 = Bench.robustRef(-1.0, Seq(100.0, 300.0, 320.0, 310.0))
    assert(ref3 >= 300.0 && ref3 <= 320.0)
    // no signal at all → -1 (axis passes)
    assert(Bench.robustRef(-1.0, Nil) == -1.0)
  }

  test("persisted clean-disk baseline parses and gates a whole-run collapse") {
    // docs/io_baseline.json records the box's demonstrated throughput; a
    // run whose EVERY probe is collapsed (r11: ≤117 MB/s) must come out
    // unclean against it rather than self-normalizing to its own best probe
    val base = Bench.ioBaseline()
    assert(base > 100.0, s"baseline missing or implausible: $base")
    assert(!Bench.iterClean(1.0, g - 1, g - 1, 117.0, base))
    // healthy probes clear the seeded reference
    assert(Bench.iterClean(1.0, g - 1, g - 1, base * 0.9, base))
  }
}
