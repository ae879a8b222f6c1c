ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "datamodelclinicaldataspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// The bench driver captures the run's stdout tail and parses the LAST
// line as the machine-readable result. Two sbt defaults break that:
// the forked process's output is re-logged with an "[info] " prefix
// (no longer raw JSON), and sbt appends a "[success] Total time: …"
// epilogue AFTER the program's last line. Pass forked stdout through
// verbatim and drop the epilogue so graft.Bench's machine line is the
// final stdout line, unprefixed.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
Global / excludeLintKeys += showSuccess
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // 220+ unique codegen'd queries in one session outgrow the default
  // 240 MB code cache; once it fills the JIT stops compiling and the
  // battery's late half runs interpreted/deopt — the r14-r16
  // session-aging mechanism. Raised for the bench battery (Bench's
  // split children inherit it via the parent's input args) and tests.
  "-XX:ReservedCodeCacheSize=512m",
)
