ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "apachenifispark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
  // TEST-ONLY ssh client (r11): hadoop's SFTPFileSystem loads
  // com.jcraft.jsch reflectively when the sftp:// scheme is first used;
  // the mwiede fork keeps the package. Production clusters ship jsch
  // with their hadoop distribution — the library itself gains no
  // dependency; this only lets SftpSpec exercise the live path.
  "com.github.mwiede" % "jsch" % "0.2.17" % Test,
  // TEST-ONLY in-JVM oracle (r12): the DuckDB JDBC driver sits in the
  // same pre-warmed offline cache the jsch find came from. It lets
  // OracleSelfSpec replay SparkEntry.oracleSql against the same parquet
  // inside `sbt test` — the driver's correctness gate reproduced with
  // zero Python — and doubles as a second live JDBC engine (columnar,
  // vs Derby's row store) behind the ExecuteSQL-family specs.
  "org.duckdb" % "duckdb_jdbc" % "1.0.0" % Test,
)
// hadoop-client-api's SFTPFileSystem is compiled against the SHADED
// jsch coordinates (org.apache.hadoop.shaded.com.jcraft.jsch) but the
// client jars ship without jsch itself; reproduce hadoop's own
// relocation offline so SftpSpec can drive the unmodified hadoop path
// against a live server (project/JschRelocate.scala).
val relocateJsch = taskKey[File]("relocate jsch into hadoop's shaded namespace")
relocateJsch := {
  import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream, FileInputStream, FileOutputStream}
  import java.util.jar.{JarEntry, JarInputStream, JarOutputStream}
  val FromSlash = "com/jcraft/jsch".getBytes("US-ASCII")
  val ToSlash = "org/apache/hadoop/shaded/com/jcraft/jsch".getBytes("US-ASCII")
  val FromDot = "com.jcraft.jsch".getBytes("US-ASCII")
  val ToDot = "org.apache.hadoop.shaded.com.jcraft.jsch".getBytes("US-ASCII")
  def readAll(in: java.io.InputStream): Array[Byte] = {
    val buf = new Array[Byte](64 * 1024)
    val acc = new ByteArrayOutputStream()
    var n = in.read(buf)
    while (n >= 0) { acc.write(buf, 0, n); n = in.read(buf) }
    acc.toByteArray
  }
  def replaceAll(b: Array[Byte], from: Array[Byte], to: Array[Byte]): Array[Byte] = {
    val acc = new ByteArrayOutputStream(b.length + 64)
    var i = 0
    while (i < b.length) {
      if (i + from.length <= b.length &&
          java.util.Arrays.equals(b.slice(i, i + from.length), from)) {
        acc.write(to); i += from.length
      } else { acc.write(b(i).toInt); i += 1 }
    }
    acc.toByteArray
  }
  // rewrite the class-file constant pool's Utf8 entries (slashed
  // internal names/descriptors AND jsch's dotted reflective config
  // strings); everything after the pool references it by index only
  def transformClass(bytes: Array[Byte]): Array[Byte] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val acc = new ByteArrayOutputStream(bytes.length + 256)
    val out = new DataOutputStream(acc)
    out.writeInt(in.readInt()); out.writeShort(in.readUnsignedShort())
    out.writeShort(in.readUnsignedShort())
    val cpCount = in.readUnsignedShort()
    out.writeShort(cpCount)
    var i = 1
    while (i < cpCount) {
      val tag = in.readUnsignedByte()
      out.writeByte(tag)
      tag match {
        case 1 =>
          val len = in.readUnsignedShort()
          val data = new Array[Byte](len)
          in.readFully(data)
          val nd = replaceAll(replaceAll(data, FromSlash, ToSlash), FromDot, ToDot)
          out.writeShort(nd.length); out.write(nd)
        case 7 | 8 | 16 | 19 | 20 => out.writeShort(in.readUnsignedShort())
        case 15 => out.writeByte(in.readUnsignedByte()); out.writeShort(in.readUnsignedShort())
        case 3 | 4 | 9 | 10 | 11 | 12 | 17 | 18 => out.writeInt(in.readInt())
        case 5 | 6 => out.writeLong(in.readLong()); i += 1
        case other => sys.error(s"unknown constant-pool tag $other")
      }
      i += 1
    }
    out.write(readAll(in))
    acc.toByteArray
  }
  val report = update.value
  val src = report.matching(artifactFilter(name = "jsch")).headOption
    .getOrElse(sys.error("jsch jar not resolved from the offline cache"))
  val dst = target.value / "jsch-shaded.jar"
  if (!dst.exists || dst.lastModified < src.lastModified) {
    IO.createDirectory(target.value)
    // jsch is a MULTI-RELEASE jar (the JDK-15+ EdDSA/XDH jce classes
    // live under META-INF/versions/15) — flatten it for the test JVM:
    // for every class take the highest variant <= 17, emit at the base
    // path, then relocate. module-info and OSGi metadata are dropped
    // (the shaded tree is not a module).
    val entries = scala.collection.mutable.Map.empty[String, Array[Byte]]
    val jin = new JarInputStream(new FileInputStream(src))
    try {
      var e = jin.getNextJarEntry
      while (e != null) {
        if (!e.isDirectory) entries(e.getName) = readAll(jin)
        e = jin.getNextJarEntry
      }
    } finally jin.close()
    val versioned = "META-INF/versions/(\\d+)/(com/jcraft/jsch/.+\\.class)".r
    val flat = scala.collection.mutable.Map.empty[String, (Int, Array[Byte])]
    entries.foreach {
      case (name, bytes) if name.startsWith("com/jcraft/jsch") && name.endsWith(".class") =>
        if (!flat.get(name).exists(_._1 > 0)) flat(name) = (0, bytes)
      case (versioned(v, base), bytes) if v.toInt <= 17 =>
        if (!flat.get(base).exists(_._1 >= v.toInt)) flat(base) = (v.toInt, bytes)
      case _ => ()
    }
    val jout = new JarOutputStream(new FileOutputStream(dst))
    try flat.toSeq.sortBy(_._1).foreach { case (base, (_, bytes)) =>
      if (!base.endsWith("module-info.class")) {
        jout.putNextEntry(new JarEntry("org/apache/hadoop/shaded/" + base))
        jout.write(transformClass(bytes))
        jout.closeEntry()
      }
    } finally jout.close()
  }
  dst
}
Test / unmanagedJars += Attributed.blank(relocateJsch.value)
Test / fork := true
run / fork := true
// Forked run output passes through verbatim (no "[info] " logger
// prefix) so Bench/Verify's machine-read JSON lines stay parseable.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // Whole-stage codegen emits fresh classes per query plan; a long
  // single-JVM run over many heavy plans fills the JIT code cache
  // (JDK default 240m), after which hot loops degrade to interpreted /
  // flush-churned execution — measured on the r12 m1000 decade bench
  // as a progressive 86s -> 648s slowdown of the SAME query as the
  // catalog run advanced (tools/NOTES_r12_m1000.md). 512m keeps a
  // full-catalog m-scale run inside the compiled regime.
  s"-XX:ReservedCodeCacheSize=${sys.env.getOrElse("SPARK_CODE_CACHE", "512m")}",
  // r16: the r15 driver bench doubled (209.5 s vs 89.2 s quiet on the
  // SAME code) with pure process-CPU inflation on the text-query family
  // (q_dup_spans 113 CPU-s vs 13.8 quiet), GC <= 0.7 s, near-idle
  // loadavg, and FLAPPING reps (min at quiet level, max 10-20x) —
  // tools/NOTES_r16_bench.md. Telemetry added this round shows a
  // healthy 192-query run peaks at 87 MB profiled code heap (no cache
  // pressure), so the standing suspect is HotSpot's recompilation
  // give-up path: catalog runs load thousands of generated classes,
  // shared hot methods (sorters, UnsafeRow accessors, text-expression
  // loops) deopt repeatedly as profiles churn, and after
  // PerMethodRecompilationCutoff (400) / PerBytecodeRecompilationCutoff
  // (200) strikes the JVM pins the method to the interpreter/C1 FOREVER
  // — a 10-40x slowdown on exactly the hot-loop family, stochastic
  // because it depends on deopt history. -1 disables the give-up: a
  // churned method keeps recompiling (bounded compiler-thread cost,
  // visible in the query_jit_max telemetry) instead of falling out of
  // compiled execution entirely.
  "-XX:PerMethodRecompilationCutoff=-1",
  "-XX:PerBytecodeRecompilationCutoff=-1",
)
// Experiment hook: extra JVM flags for forked run/test JVMs (e.g.
// SPARK_JIT_OPTS="-XX:TypeProfileWidth=8" for the r12 session-decay
// mitigation probes — tools/NOTES_r12_m1000.md "Same-JVM session decay").
javaOptions ++= sys.env.get("SPARK_JIT_OPTS")
  .map(_.trim.split("\\s+").toSeq.filter(_.nonEmpty)).getOrElse(Seq.empty)
