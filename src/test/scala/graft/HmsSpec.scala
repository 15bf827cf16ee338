package graft

import org.scalatest.funsuite.AnyFunSuite

/** Drives [[graft.tools.HmsRoundtrip]] as two SEPARATE JVMs against
  * one embedded-Derby Hive metastore — the genuine cross-process
  * persistence the InMemoryCatalog round-trip (SqlSurfaceSpec) cannot
  * prove. Runs outside SparkSpec: each phase owns its SparkSession
  * (hive catalog impl is a static conf, so it can't share this JVM's
  * in-memory-catalog session).
  */
class HmsSpec extends AnyFunSuite {

  private def run(phase: String, work: String): (Int, String) = {
    val jvmOpts = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.toArray.map(_.toString)
      .filter(a => a == "--add-opens" || a.contains("=ALL-UNNAMED") || a.startsWith("-Xmx"))
    val cmd = Seq("java") ++ jvmOpts ++ Seq(
      s"-Dderby.system.home=$work",
      "-cp", System.getProperty("java.class.path"),
      "graft.tools.HmsRoundtrip", phase, work)
    val out = new StringBuilder
    import scala.sys.process._
    val rc = Process(cmd).!(ProcessLogger(l => out.append(l).append('\n'), _ => ()))
    (rc, out.toString)
  }

  test("A28 at full strength: graft registrations persist in a real Hive metastore across JVMs") {
    val work = "/root/repo/target/laketest/hms-roundtrip"
    val f = new java.io.File(work)
    if (f.exists()) { import scala.sys.process._; Seq("rm", "-rf", work).!; () }
    val (rc1, out1) = run("write", work)
    assert(rc1 === 0, s"write phase failed:\n$out1")
    assert(out1.contains("WRITE OK"), out1)
    val (rc2, out2) = run("read", work)
    assert(rc2 === 0, s"read phase failed:\n$out2")
    assert(out2.contains("READ OK"), out2)
  }
}
