package graft.operators

/** Bytecode-derived CODE SIGNATURES for memoized /tmp fixtures (round-17
  * verdict item 1).
  *
  * The maintained/stream-ingested/edited/CDC index fixtures persist in
  * /tmp keyed on their SOURCE fixture's identity alone — so a store built
  * by a PRIOR round's (correct) maintenance code kept serving after the
  * code changed, and the driver's hash gate never re-exercised
  * `InvertedIndex.append`/`edit` after an edit to them: a regression
  * would hash-check stale-but-correct content until /tmp was wiped by
  * hand. Embedding a version of the maintenance CODE in the fixture key
  * closes that: any change to the classes on the maintenance path yields
  * a new key, and the next Verify/bench run rebuilds the store through
  * the changed code.
  *
  * The version is not a hand-bumped constant (which a round could forget
  * to bump — the exact failure mode being closed) but a 64-bit FNV-1a
  * hash of the COMPILED CLASSFILE BYTES of the named classes: any edit
  * that survives compilation — logic, constants, even a comment shift
  * (line-number tables live in the bytecode) — changes the signature.
  * Over-eager rebuilds (a comment-only edit) cost a few seconds of
  * fixture build; a missed rebuild costs a silent gate blind spot.
  * Scala 2.13 compiles an object's methods AND its lambdas (via
  * LambdaMetaFactory) into the object's own classfile, so signing
  * `Foo.getClass` covers `Foo`'s behavior; nested classes would need
  * their own entry (none of the signed objects define any that carry
  * maintenance logic).
  *
  * Deterministic within a build, stable across JVMs running the same
  * jars, and ~free (a few hundred KB hashed once per class set per JVM).
  */
object CodeSig {

  private val memo =
    new java.util.concurrent.ConcurrentHashMap[Seq[String], String]()

  /** FNV-1a 64 over `bytes`, continuing from `seed` (chain for multiple
    * inputs). Offset basis 0xcbf29ce484222325, prime 0x100000001b3. */
  private[operators] def fnv64(bytes: Array[Byte],
                               seed: Long = 0xcbf29ce484222325L): Long = {
    var h = seed
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** 16-hex-char FNV-1a 64 of a string — the 64-bit fixture-key hash
    * (round-17 verdict item 6: the old 32-bit MurmurHash3 keys made a
    * silent two-dirs-collide re-staging thrash possible). */
  def hash64Hex(s: String): String =
    f"${fnv64(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))}%016x"

  private def classBytes(cls: Class[_]): Array[Byte] = {
    val res = "/" + cls.getName.replace('.', '/') + ".class"
    val in = cls.getResourceAsStream(res)
    require(in != null,
      s"classfile $res not found on the classpath — cannot version-key " +
        "fixtures on code identity")
    try in.readAllBytes() finally in.close()
  }

  /** The class's SATELLITE classfiles (`Foo$$anonfun$N`,
    * `Foo$$typecreator…`), when the classpath entry is a plain
    * directory (sbt's layout — always true here). scalac emits SOME
    * lambda/typetag bodies as separate classfiles, so a same-line edit
    * inside one could leave the object's own classfile byte-identical
    * (no line-number shift) — hashing the siblings closes that hole.
    * A jar-packed class FAILS LOUDLY (round-18 ADVICE): silently
    * skipping jar satellites would make the same compiled code yield a
    * DIFFERENT signature in a jar-layout JVM than in sbt's directory
    * layout — two same-commit co-tenant JVMs would then address
    * different fixture dirs, double-build every family, and each would
    * retire the other's fixture as a stale sibling after 2h. Every
    * supported entry point here (sbt test, sbt run, plain `java -cp
    * target/...classes`) loads graft classes from a directory; if a
    * deployment ever packs them into a jar, signature computation must
    * be taught to hash the jar's satellite entries, not left to degrade. */
  private def satelliteBytes(cls: Class[_]): Seq[(String, Array[Byte])] = {
    val simple = cls.getName.substring(cls.getName.lastIndexOf('.') + 1)
    val url = cls.getResource(simple + ".class")
    require(url != null && url.getProtocol == "file",
      s"${cls.getName} loads from ${if (url == null) "<unresolvable>" else url} " +
        "— CodeSig only signs directory-layout classfiles (satellite " +
        "classfiles of jar-packed classes would be silently skipped, " +
        "making the signature layout-dependent); hash jar entries before " +
        "packing graft into a jar")
    val dir = java.nio.file.Paths.get(url.toURI).getParent
    val stem = simple.stripSuffix("$") + "$$"
    scala.util.Using.resource(java.nio.file.Files.list(dir)) { st =>
      val it = st.iterator()
      val b = scala.collection.mutable.Buffer.empty[(String, Array[Byte])]
      while (it.hasNext) {
        val p = it.next()
        val n = p.getFileName.toString
        if (n.startsWith(stem) && n.endsWith(".class"))
          b += ((n, java.nio.file.Files.readAllBytes(p)))
      }
      b.sortBy(_._1).toSeq // deterministic order
    }
  }

  /** The 16-hex signature of `classes`' compiled bytes (object
    * classfile + lambda/typetag satellites), order-sensitive (callers
    * pass a fixed list). Memoized per class set per JVM. */
  def of(classes: Class[_]*): String = {
    val key = classes.map(_.getName)
    memo.computeIfAbsent(key, _ => {
      var h = 0xcbf29ce484222325L
      classes.foreach { c =>
        // chain the class NAME too, so swapping one class for another
        // with (improbably) identical bytes still changes the signature
        h = fnv64(c.getName.getBytes(java.nio.charset.StandardCharsets.UTF_8), h)
        h = fnv64(classBytes(c), h)
        satelliteBytes(c).foreach { case (n, bytes) =>
          h = fnv64(n.getBytes(java.nio.charset.StandardCharsets.UTF_8), h)
          h = fnv64(bytes, h)
        }
      }
      f"$h%016x"
    })
  }
}
