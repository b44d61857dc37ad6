ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "hadronspark"
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
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 8g MEASURED faster than 32g for this suite (round 9, alternating
  // A/B): q19's allocation-heavy pair kernel ran 1.5 s at 8g vs
  // 9-14 s at -Xms32g/-Xmx32g — a big fresh heap page-faults/THP-
  // stalls harder than a small recycled one, and Spark's larger
  // execution-memory grant just builds deeper agg maps before
  // spilling. Do not "upgrade" this without re-running that A/B.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
) ++
// measurement hook: extra -D flags for config A/Bs (Spark adopts
// spark.* system properties as conf defaults) without editing code —
// e.g. SPARK_GRAFT_EXTRA_JAVA_OPTS="-Dspark.sql.join.preferSortMergeJoin=false"
// LIMITATION (round-17 ADVICE): split on whitespace — a -D value that
// itself contains a space would break into bogus options; none of the
// spark.* flags this hook exists for carry spaces.
sys.env.get("SPARK_GRAFT_EXTRA_JAVA_OPTS")
  .map(_.split("\\s+").toSeq.filter(_.nonEmpty)).getOrElse(Seq.empty)
