package graft.core

/** Pre-flight resource estimate — the driver-side cost model and RAM
  * gate the reference prints before starting a run
  * (example/main.py:207-267), scoped per SURVEY §4.2 to an estimate
  * printout only (Spark's own scheduler owns actual admission).
  *
  * The reference's calibration: 0.00050067901 sec/KB (≈ 1.95 MB/s) on
  * its 8-logical-CPU reference machine, scaled by how many CPUs the run
  * may use (`usableCpus` — the reference's cpus_affinity_options) and a
  * contention surcharge that grows as the run is confined to a smaller
  * share of the machine (main.py:208). The RAM gate budgets a flat
  * 100 MB per worker process against free RAM minus a 1 GiB reserve
  * (main.py:210-217) and recommends an input-root-folder count that
  * fits (the reference parallelizes one pipeline per root folder).
  *
  * On Spark the worker-process number maps to executor cores and the
  * recommendation to input partition count; the formulas are kept
  * reference-exact so the printout is comparable to the original's.
  */
object ResourceEstimate {

  /** Reference throughput calibration: seconds per KB of input on the
    * reference machine (example/main.py:208, "0.00050067901 sec/ko"). */
  val SecPerKB: Double = 0.00050067901

  /** CPU count of the machine the constant was calibrated on. */
  val RefCpus: Int = 8

  /** Flat RAM budget per worker process, MB (main.py:210). */
  val RamPerProcessMB: Long = 100L

  /** RAM held back from the free-RAM budget, MB (main.py:213). */
  val RamReserveMB: Long = 1024L

  /** Headroom factor in the recommended-folders formula (main.py:217). */
  val PipelineMajoration: Double = 1.6

  final case class Estimate(
      execTimeSec: Double,
      nProcesses: Int,
      estimatedRamMB: Long,
      usableRamMB: Long,
      ramOk: Boolean,
      recommendedRootFolders: Int) {
    /** The reference's pre-flight log block (main.py:219-243), trimmed
      * to the derived numbers. */
    def render: String =
      f"""Estimated exec time       = $execTimeSec%.1f s
         |Worker processes          = $nProcesses
         |Estimated RAM             = ${estimatedRamMB}MB (${RamPerProcessMB}MB each)
         |RAM available             = ${usableRamMB}MB (free - ${RamReserveMB}MB reserve)
         |RAM gate                  = ${if (ramOk) "OK" else "INSUFFICIENT"}
         |Recommended root folders  = $recommendedRootFolders""".stripMargin
  }

  /** Runtime model (main.py:208): base rate rescaled from the 8-CPU
    * calibration machine to `usableCpus`, times a contention surcharge
    * `1 + (1 − usable/total)` for runs confined to a slice of the box,
    * times input KB. */
  def estimateRuntimeSec(inDirSizeMB: Double, usableCpus: Int, totalCpus: Int): Double = {
    require(usableCpus >= 1 && totalCpus >= usableCpus,
      s"need 1 <= usableCpus ($usableCpus) <= totalCpus ($totalCpus)")
    (SecPerKB * RefCpus / usableCpus) *
      (1.0 + (1.0 - usableCpus.toDouble / totalCpus)) *
      inDirSizeMB * 1024.0
  }

  /** Full pre-flight estimate. `nRootDirs` and `processesPerPipeline`
    * mirror the reference's process topology (one pipeline per input
    * root unless mono-pipeline, `nbr_processes_per_pip` workers each —
    * main.py:209,216). */
  def estimate(
      inDirSizeMB: Double,
      usableCpus: Int,
      totalCpus: Int,
      freeRamMB: Long,
      nRootDirs: Int,
      processesPerPipeline: Int,
      monoPipeline: Boolean = false): Estimate = {
    val nProcesses =
      (if (monoPipeline) 1 else nRootDirs) * processesPerPipeline
    val estimatedRamMB = nProcesses * RamPerProcessMB
    val usableRamMB = math.max(0L, freeRamMB - RamReserveMB)
    val recommended = math.max(1L, math.ceil(
      (usableRamMB.toDouble / RamPerProcessMB) /
        math.floor(processesPerPipeline * PipelineMajoration)).toLong)
    Estimate(
      execTimeSec = estimateRuntimeSec(inDirSizeMB, usableCpus, totalCpus),
      nProcesses = nProcesses,
      estimatedRamMB = estimatedRamMB,
      usableRamMB = usableRamMB,
      ramOk = usableRamMB >= estimatedRamMB,
      recommendedRootFolders = recommended.toInt)
  }
}
