package graft

import org.scalatest.funsuite.AnyFunSuite

/** VERDICT r15 #6: the bench artifact must ACT on its own load
  * self-certification — sleep-and-retry once over the threshold, then
  * self-mark invalid — so a driver-round number taken on a loaded box
  * can never again masquerade as a regression (r14 and r15 both burned
  * judge time on exactly that).
  */
class BenchGateSpec extends AnyFunSuite {

  private def gate(readings: Double*): (Double, Boolean, Int) = {
    var slept = 0
    val it = readings.iterator
    val (l, inv) = Bench.loadGate(() => it.next(), () => slept += 1)
    (l, inv, slept)
  }

  test("idle box: first reading accepted, no sleep, valid") {
    assert(gate(0.8, 99.0) === ((0.8, false, 0)))
  }

  test("exactly at the threshold is still valid") {
    assert(gate(2.0) === ((2.0, false, 0)))
  }

  test("loaded then idle: one retry, second reading reported, valid") {
    assert(gate(3.1, 1.2) === ((1.2, false, 1)))
  }

  test("loaded twice: one retry only, artifact self-marks invalid") {
    assert(gate(3.1, 2.9) === ((2.9, true, 1)))
  }

  test("unreadable /proc/loadavg (negative) is unknown, not invalid") {
    assert(gate(-1.0) === ((-1.0, false, 0)))
  }
}
