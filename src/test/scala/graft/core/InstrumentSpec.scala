package graft.core

import org.scalatest.funsuite.AnyFunSuite

class InstrumentSpec extends AnyFunSuite {

  test("timed returns the body value and records the stage") {
    Instrument.reset()
    val out = Instrument.timed("stage_a") { 40 + 2 }
    assert(out == 42)
    val t = Instrument.timings
    assert(t.map(_._1) == Seq("stage_a"))
    assert(t.head._2 >= 0.0)
  }

  test("ledger accumulates in order and summary formats every stage") {
    Instrument.reset()
    Instrument.timed("s1") { 1 }
    Instrument.timed("s2") { 2 }
    assert(Instrument.timings.map(_._1) == Seq("s1", "s2"))
    val s = Instrument.summary
    assert(s.contains("s1=") && s.contains("s2="))
  }

  test("quiet mode still measures") {
    Instrument.reset()
    Instrument.setQuiet(true)
    try {
      assert(Instrument.timed("q") { "v" } == "v")
      assert(Instrument.timings.nonEmpty)
    } finally Instrument.setQuiet(false)
  }
}
