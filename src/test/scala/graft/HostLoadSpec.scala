package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the machine-weather capture (r10 verdict #1): the bench artifact
  * must carry a load profile per timed phase so a contended recording is
  * distinguishable from a plan regression WITHOUT a human reading the
  * cold≫warm signature. */
class HostLoadSpec extends AnyFunSuite {

  test("around() profiles a busy interval: wall > 0, proc CPU > 0, ext share in [0,100]") {
    val (x, p) = HostLoad.around {
      // ~200ms of genuine CPU so procCpuSec is measurably positive
      val end = System.nanoTime() + 200000000L
      var acc = 0L
      while (System.nanoTime() < end) acc += java.util.Arrays.hashCode(Array(acc))
      acc
    }
    assert(x != Long.MinValue) // keep the loop un-eliminable
    assert(p.wallSec > 0.1 && p.wallSec < 30.0, s"wall ${p.wallSec}")
    assert(p.procCpuSec > 0.0, s"proc cpu ${p.procCpuSec} — process CPU time must be readable")
    // this runs on Linux/procfs in CI and the sandbox; ext share is a
    // percentage of machine capacity, bounded by construction
    assert(p.extCpuPct >= 0.0 && p.extCpuPct <= 100.0, s"ext ${p.extCpuPct}")
    assert(p.la1Start >= 0.0, s"loadavg ${p.la1Start} — /proc/loadavg must be readable here")
  }

  test("phase json is a flat numeric object with the seven contract keys") {
    val ((), p) = HostLoad.around(())
    val j = p.json
    for (k <- Seq("wall_sec", "proc_cpu_sec", "ext_cpu_pct", "la1_start", "la1_end",
        "gc_sec", "iowait_pct"))
      assert(j.contains("\"" + k + "\""), s"missing $k in $j")
    // must parse as JSON — the driver tail-captures the summary line
    assert(j.startsWith("{") && j.endsWith("}") && !j.contains("Infinity") && !j.contains("NaN"))
  }

  test("json rendering never mutates the JVM default locale") {
    // regression pin (r11): Phase.json once called Locale.setDefault(ROOT);
    // Derby CREATE DATABASE rejects the empty ROOT language tag, so every
    // txn-sink test that ran after this suite failed — library code must
    // format with an explicit locale, not flip process-global state
    val before = java.util.Locale.getDefault()
    val tr = new java.util.Locale("tr", "TR") // the classic casing landmine
    java.util.Locale.setDefault(tr)
    try {
      val ((), p) = HostLoad.around(())
      assert(":-?\\d+,\\d".r.findFirstIn(p.json).isEmpty && p.json.contains("."),
        s"json must be dot-decimal under any default locale: ${p.json}")
      assert(java.util.Locale.getDefault() == tr,
        "Phase.json mutated the JVM default locale")
    } finally java.util.Locale.setDefault(before)
  }
}
