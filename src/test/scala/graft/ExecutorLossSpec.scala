package graft

import org.scalatest.funsuite.AnyFunSuite

/** Executor-LOSS soak — the fault class CheckpointRecoverySpec does not
  * cover: a whole executor JVM SIGKILLed mid-query. The harness
  * ([[FaultHarness]]) runs a REAL multi-process `local-cluster[2,2,1024]`
  * in a child JVM; this spec watches the child's process tree, kills one
  * `CoarseGrainedExecutorBackend` while the query is provably in flight
  * (between the harness's start/end markers), and asserts the child
  * completes with the EXACT integer checksum an unharmed session
  * computes — shuffle-map recompute (batch leg) and in-flight micro-batch
  * task retry (streaming leg) must be invisible in the answer.
  */
class ExecutorLossSpec extends AnyFunSuite {

  private val sparkHome = "/opt/spark"

  private def launch(mode: String): (java.io.File, java.io.File, Process) = {
    val outFile = java.io.File.createTempFile(s"fault_${mode}_out", ".txt")
    val logFile = java.io.File.createTempFile(s"fault_${mode}_log", ".txt")
    outFile.delete()
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar")
      .flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cp = s"$sparkHome/jars/*:target/scala-2.13/classes:target/scala-2.13/test-classes"
    val cmd = (Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx2g", "-Dspark.ui.enabled=false", "-cp", cp,
      "graft.FaultHarness", mode, outFile.getAbsolutePath)).toArray
    val pb = new ProcessBuilder(cmd: _*)
    pb.environment().put("SPARK_HOME", sparkHome)
    pb.environment().put("SPARK_SCALA_VERSION", "2.13")
    pb.redirectErrorStream(true)
    pb.redirectOutput(logFile)
    (outFile, logFile, pb.start())
  }

  private def readLog(f: java.io.File): String =
    if (f.exists()) new String(java.nio.file.Files.readAllBytes(f.toPath)) else ""

  private def awaitTrue(timeoutMs: Long, what: String)(cond: => Boolean): Unit = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (!cond) {
      assert(System.nanoTime() < deadline, s"timed out waiting for $what")
      Thread.sleep(100)
    }
  }

  private def executorsOf(p: Process): Seq[ProcessHandle] = {
    import scala.jdk.CollectionConverters._
    p.toHandle.descendants().iterator().asScala.filter { h =>
      h.info().commandLine().map[Boolean](
        _.contains("CoarseGrainedExecutorBackend")).orElse(false)
    }.toSeq
  }

  /** Launch, wait for in-flight query + live executors, SIGKILL one
    * executor, prove the query had not finished, await clean exit. */
  private def runWithKill(mode: String): String = {
    val (out, log, child) = launch(mode)
    try {
      awaitTrue(180000, s"$mode query start")(
        readLog(log).contains("HARNESS_QUERY_START"))
      awaitTrue(60000, "a live executor JVM")(executorsOf(child).nonEmpty)
      Thread.sleep(1000) // let tasks land on the victim
      val victims = executorsOf(child)
      assert(victims.nonEmpty, "executors vanished before the kill")
      val victim = victims.head
      val preKill = readLog(log)
      victim.destroyForcibly()
      assert(!preKill.contains("HARNESS_QUERY_END"),
        s"$mode query finished before the kill could land — enlarge the workload")
      awaitTrue(30000, "victim executor death")(!victim.isAlive)
      // bounded wait (the awaitTrue deadline discipline): a wedged harness
      // JVM — e.g. a hung standalone master after the kill — must fail the
      // test, not block the whole suite on an untimed waitFor
      assert(child.waitFor(5, java.util.concurrent.TimeUnit.MINUTES),
        s"harness still running 5 min after executor loss; log tail:\n" +
          readLog(log).linesIterator.toSeq.takeRight(40).mkString("\n"))
      assert(child.exitValue() == 0,
        s"harness exited nonzero after executor loss; log tail:\n" +
          readLog(log).linesIterator.toSeq.takeRight(40).mkString("\n"))
      val res = readLog(log)
      assert(res.contains("HARNESS_QUERY_END"), "query never completed")
      new String(java.nio.file.Files.readAllBytes(out.toPath)).trim
    } finally {
      child.destroyForcibly()
      out.delete(); log.delete()
    }
  }

  test("batch shuffle agg survives a SIGKILLed executor with an identical answer") {
    assume(new java.io.File(s"$sparkHome/bin/spark-class").exists(),
      "needs a SPARK_HOME layout for local-cluster executor launch")
    val got = runWithKill("batch")
    val expected = FaultHarness.batchChecksum(SparkSpec.spark, 24000000L)
    assert(got == s"$expected",
      s"post-kill checksum $got != unharmed $expected")
  }

  test("streaming micro-batches survive a SIGKILLed executor exactly-once") {
    assume(new java.io.File(s"$sparkHome/bin/spark-class").exists(),
      "needs a SPARK_HOME layout for local-cluster executor launch")
    val got = runWithKill("stream")
    val expected = FaultHarness.streamChecksum(SparkSpec.spark, 3000000L)
    assert(got == s"$expected 5",
      s"post-kill stream fold '$got' != unharmed '$expected 5' " +
        "(total checksum, 5 micro-batches)")
  }
}
