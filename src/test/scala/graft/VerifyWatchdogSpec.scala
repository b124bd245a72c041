package graft

import org.scalatest.funsuite.AnyFunSuite

/** The per-query watchdog both driver mains run under (the r11
  * lesson: a query whose ANALYSIS never returns cannot be caught —
  * it must be abandoned on a bounded daemon thread so the loop moves
  * on and the artifact keeps every other result).
  */
class VerifyWatchdogSpec extends AnyFunSuite {

  test("a body that never returns is reported as a timeout and the " +
    "caller regains control within the bound") {
    val t0 = System.nanoTime()
    val out = Verify.bounded[Int]("hang", 1) {
      Thread.sleep(600000); 1
    }
    val elapsedMs = (System.nanoTime() - t0) / 1000000
    assert(out == Left("timeout"))
    assert(elapsedMs < 5000, s"watchdog did not fire in time: $elapsedMs ms")
  }

  test("a healthy body passes its value through") {
    assert(Verify.bounded("ok", 30)(41 + 1) == Right(42))
  }

  test("a throwing body is a named failure, not a timeout") {
    val out = Verify.bounded[Int]("boom", 30)(sys.error("kapow"))
    assert(out.isLeft)
    assert(out.swap.exists(_.contains("kapow")), out.toString)
  }
}
