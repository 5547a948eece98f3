package graft

import org.scalatest.funsuite.AnyFunSuite

/** The host-calibration probe and the drift-baseline history parsing —
  * pure-JVM units of [[Bench]] (no Spark session needed). */
class BenchProbeSpec extends AnyFunSuite {

  test("mixChecksum is deterministic fixed work, sensitive to seed and iters") {
    val a = Bench.HostProbe.mixChecksum(42L, 100000L)
    assert(a === Bench.HostProbe.mixChecksum(42L, 100000L))
    assert(a !== Bench.HostProbe.mixChecksum(43L, 100000L))
    assert(a !== Bench.HostProbe.mixChecksum(42L, 100001L))
  }

  test("measure returns positive wall times and a run-stable checksum") {
    val (one1, mt1, chk1) = Bench.HostProbe.measure(threads = 2)
    val (_, _, chk2) = Bench.HostProbe.measure(threads = 2)
    assert(one1 > 0 && mt1 > 0)
    // same seeds + same iters + same thread count → identical checksum:
    // the committed record's chk field proves rounds did identical work
    assert(chk1 === chk2)
  }

  private def withHistory(lines: Seq[String])(body: String => Unit): Unit = {
    val p = java.nio.file.Files.createTempFile("bench_hist", ".jsonl")
    try {
      java.nio.file.Files.writeString(p, lines.mkString("", "\n", "\n"))
      body(p.toString)
    } finally java.nio.file.Files.deleteIfExists(p)
  }

  private def rec(sf: String, q: String, sec: Double, ok: Boolean,
      probeMt: Option[Double] = None): String = {
    val probe = probeMt
      .map(v => s""","probe":{"pre_1t":0.2,"pre_mt":$v,"post_1t":0.2,"post_mt":$v,"threads":32,"iters":1,"chk":"0","host_ratio":1.000}""")
      .getOrElse("")
    s"""{"metric":"total_ok","value":$sec,"queries":{"$q":{"sec":$sec,"ok":$ok}},"sf":"$sf"$probe}"""
  }

  test("priorSecs: min over matching-sf ok entries; failures and other sf excluded") {
    withHistory(Seq(
      rec("/d/sf1", "q1", 9.0, ok = true),   // wrong sf — out
      rec("/d/sf0.1", "q1", 2.0, ok = true),
      rec("/d/sf0.1", "q1", 1.5, ok = true),
      rec("/d/sf0.1", "q1", 0.1, ok = false) // failed — out
    )) { path =>
      assert(Bench.priorSecs("/d/sf0.1", path) === Map("q1" -> 1.5))
      assert(Bench.priorSecs("/d/sf9", path) === Map.empty)
    }
  }

  test("priorProbeMt: MEDIAN pre_mt over the same matching-sf records; None when absent") {
    withHistory(Seq(
      rec("/d/sf1", "q1", 9.0, ok = true, probeMt = Some(0.1)), // wrong sf
      rec("/d/sf0.1", "q1", 2.0, ok = true),                    // probe-less era
      rec("/d/sf0.1", "q1", 1.5, ok = true, probeMt = Some(0.42)),
      rec("/d/sf0.1", "q1", 1.6, ok = true, probeMt = Some(0.37))
    )) { path =>
      // median, not min (r14 advice: a min denominator turns ordinary
      // probe jitter into a permanently loosened drift trigger) —
      // even count takes the upper median: sorted [0.37, 0.42] → 0.42
      assert(Bench.priorProbeMt("/d/sf0.1", path) === Some(0.42))
      // no probe anywhere in matching records → None → host-ratio 1
      withHistory(Seq(rec("/d/sf0.1", "q1", 2.0, ok = true))) { p2 =>
        assert(Bench.priorProbeMt("/d/sf0.1", p2) === None)
      }
    }
  }

  test("priorProbeMt reads only the HistoryDepth most recent matching records") {
    val lines = (1 to Bench.HistoryDepth + 2).map { i =>
      rec("/d/sf0.1", "q1", i.toDouble, ok = true, probeMt = Some(i.toDouble))
    }
    withHistory(lines) { path =>
      // probes 1.0 and 2.0 fell off the takeRight(HistoryDepth) window;
      // median of the surviving [3,4,5] is 4
      assert(Bench.priorProbeMt("/d/sf0.1", path) === Some(4.0))
    }
  }

  test("host-ratio noise floor: sub-1.15 jitter must not loosen the trigger") {
    // the floor is applied in main()'s hostRatio; assert the constant
    // here so a silent removal fails a test, and pin the arithmetic
    // the floor exists for: 0.68/0.62 ≈ 1.10 < floor → ratio stays 1
    assert(Bench.HostRatioFloor === 1.15)
    assert(0.68 / 0.62 < Bench.HostRatioFloor)
  }
}
