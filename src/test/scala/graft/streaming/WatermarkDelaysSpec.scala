package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

class WatermarkDelaysSpec extends AnyFunSuite {
  test("cascade accumulates upstream buffering per stage") {
    val d = WatermarkDelays.referenceChain(sourceOutOfOrderMs = 1000L)
    assert(d("combineDeliveryLog") == 1000L)
    assert(d("viewInsertionJoin") == 1000L + 2000L)
    assert(d("insertionImpressionJoin") == 1000L + 2000L + 600000L)
    assert(d("impressionActionJoin") == 1000L + 2000L + 600000L + 1800000L)
  }
}
