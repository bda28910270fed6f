package graft

/** Shared launcher for the cross-JVM day-table crash/race specs: spawns
  * a REAL second JVM running [[DayStressChild]]'s staged overwrite with
  * the JDK-17 add-opens Spark needs, stdout+stderr teed to `log`. */
object DayChildHarness {

  def spawn(dir: String, leaseMs: Long, log: java.io.File,
      mode: String = "overwrite"): Process = {
    val javaBin = java.nio.file.Paths.get(sys.props("java.home"), "bin", "java").toString
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar",
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx2g", "-Dspark.ui.enabled=false",
      "-Dspark.sql.session.timeZone=UTC",
      "-Duser.language=en", "-Duser.country=US",
      "-cp", sys.props("java.class.path"),
      "graft.DayStressChild", dir, leaseMs.toString, mode)
    new ProcessBuilder(cmd: _*).redirectErrorStream(true)
      .redirectOutput(log).start()
  }

  def childDone(log: java.io.File): Boolean = scala.util.Try(
    new String(java.nio.file.Files.readAllBytes(log.toPath), "UTF-8")).toOption
    .exists(_.contains("CHILD_DONE"))

  def logTail(log: java.io.File): String = scala.util.Try(
    new String(java.nio.file.Files.readAllBytes(log.toPath), "UTF-8")).getOrElse("")
    .takeRight(2000)
}
