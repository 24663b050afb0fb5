ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "daskemnistclassificationspark"
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
  // Let dev.ludovic.netlib pick its Vector-API BLAS (VectorBLAS) instead
  // of the scalar Java fallback — no native BLAS ships in this image, and
  // the SIMD path measurably speeds the 1,024-dim covariance/SVD work in
  // the ML queries. Harmless where unsupported (netlib falls back).
  "--add-modules=jdk.incubator.vector",
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // Pin the JVM zone too: tests build java.sql.Timestamps via
  // Timestamp.valueOf (JVM-default-zone wall clock) and assert against
  // UTC-rendered session output — on a non-UTC host they'd diverge.
  "-Duser.timezone=UTC",
  // Local mode = one JVM: driver heap is the ONLY memory knob. 8g is
  // MEASURED faster than 48g here (48g cost q32 +13 s: default GC
  // geometry scales the young gen with the heap and the MLlib fits'
  // short-lived allocation storm turns that into longer pauses across
  // 32 threads). Env-overridable either direction.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
