package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.ResourceEstimate

/** Unit tests of the pre-flight cost model (example/main.py:207-267) —
  * pure arithmetic, no Spark session. */
class ResourceEstimateSpec extends AnyFunSuite {

  test("runtime model reproduces the reference calibration point") {
    // On the 8-CPU reference machine using all 8 CPUs the surcharge
    // term is 1.0 and the model is exactly 0.00050067901 s/KB —
    // i.e. ≈ 0.513 s per MB, the 1.95 MB/s rate BASELINE.md publishes.
    val secPerMB = ResourceEstimate.estimateRuntimeSec(1.0, 8, 8)
    assert(math.abs(secPerMB - 0.00050067901 * 1024) < 1e-9)
    assert(math.abs(1.0 / secPerMB - 1.95) < 0.01) // MB/s
  }

  test("runtime model scales with usable CPUs and adds the confinement surcharge") {
    val full = ResourceEstimate.estimateRuntimeSec(100.0, 8, 8)
    // half the CPUs: base rate doubles AND surcharge 1.5× ⇒ 3× total
    val half = ResourceEstimate.estimateRuntimeSec(100.0, 4, 8)
    assert(math.abs(half / full - 3.0) < 1e-9)
    assert(ResourceEstimate.estimateRuntimeSec(200.0, 8, 8) === full * 2)
  }

  test("RAM gate passes and fails on the reference's 100MB-per-process budget") {
    val ok = ResourceEstimate.estimate(
      inDirSizeMB = 10, usableCpus = 4, totalCpus = 8,
      freeRamMB = 8192, nRootDirs = 4, processesPerPipeline = 5)
    assert(ok.nProcesses === 20)
    assert(ok.estimatedRamMB === 2000)
    assert(ok.usableRamMB === 8192 - 1024)
    assert(ok.ramOk)

    val tight = ResourceEstimate.estimate(
      inDirSizeMB = 10, usableCpus = 4, totalCpus = 8,
      freeRamMB = 2048, nRootDirs = 4, processesPerPipeline = 5)
    assert(!tight.ramOk) // 1024 usable < 2000 estimated
    // recommendation shrinks to what fits: (1024/100) / floor(5·1.6) = 2
    assert(tight.recommendedRootFolders === 2)
  }

  test("mono-pipeline collapses the process count to one pipeline") {
    val e = ResourceEstimate.estimate(
      inDirSizeMB = 1, usableCpus = 8, totalCpus = 8,
      freeRamMB = 4096, nRootDirs = 7, processesPerPipeline = 5,
      monoPipeline = true)
    assert(e.nProcesses === 5)
  }

  test("render emits the pre-flight block") {
    val e = ResourceEstimate.estimate(
      inDirSizeMB = 100, usableCpus = 8, totalCpus = 8,
      freeRamMB = 8192, nRootDirs = 2, processesPerPipeline = 5)
    val r = e.render
    assert(r.contains("Estimated exec time"))
    assert(r.contains("RAM gate                  = OK"))
    assert(r.contains("Worker processes          = 10"))
  }
}
