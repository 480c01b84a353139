package graft.stage

import java.io.InputStream
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Internal (local-directory) stage, mirroring the reference's stage
  * manager semantics (reference `pkg/stage/manager.go`): a named directory
  * per stage holding files for COPY INTO; PUT/GET/LIST/REMOVE with glob
  * patterns and path-traversal sanitization (`manager.go:89-130` rejects
  * `..` and absolute paths; listing walks the tree and applies
  * `filepath.Match` per file, `manager.go:165-218`).
  *
  * External stages (S3/Azure/GCS) are unsupported in the reference
  * (`README.md:303`); here any Hadoop-FS-resolvable path would work the
  * same way through spark.read, but the managed surface is local-dir.
  */
final class StageManager(root: Path) {

  Files.createDirectories(root)

  final case class StagedFile(relativePath: String, sizeBytes: Long)

  /** Reject absolute paths and any `..` traversal, as the reference does. */
  private def sanitize(rel: String): Path = {
    require(rel.nonEmpty, "empty stage path")
    val p = Paths.get(rel)
    require(!p.isAbsolute, s"absolute paths not allowed: $rel")
    require(!p.iterator().asScala.exists(_.toString == ".."),
      s"path traversal not allowed: $rel")
    val norm = root.resolve(rel).normalize()
    require(norm.startsWith(root), s"path escapes stage: $rel")
    norm
  }

  def stageDir(stageName: String): Path = {
    val d = sanitize(stageName)
    Files.createDirectories(d)
    d
  }

  /** PUT: upload a file into the stage (creates nested dirs). */
  def put(stageName: String, relPath: String, in: InputStream): StagedFile = {
    val target = sanitize(s"$stageName/$relPath")
    Files.createDirectories(target.getParent)
    Files.copy(in, target, StandardCopyOption.REPLACE_EXISTING)
    StagedFile(s"$relPath", Files.size(target))
  }

  def put(stageName: String, relPath: String, content: Array[Byte]): StagedFile = {
    val target = sanitize(s"$stageName/$relPath")
    Files.createDirectories(target.getParent)
    Files.write(target, content)
    StagedFile(s"$relPath", content.length.toLong)
  }

  /** Resolve a user-supplied path inside a stage with full traversal
    * sanitization — the entry point COPY INTO must use (the reference
    * rejects `..`/absolute paths centrally, `manager.go:89-130`). */
  def resolve(stageName: String, relPath: String): Path =
    if (relPath.isEmpty) stageDir(stageName)
    else sanitize(s"$stageName/$relPath")

  /** GET: open a staged file for reading. */
  def get(stageName: String, relPath: String): InputStream =
    Files.newInputStream(sanitize(s"$stageName/$relPath"))

  /** LIST with optional glob pattern over the path relative to the stage
    * root (e.g. `*.csv`, or a glob with subdirectories). */
  def list(stageName: String, pattern: Option[String] = None): Seq[StagedFile] = {
    val dir = sanitize(stageName)
    if (!Files.isDirectory(dir)) return Nil
    val matcher = pattern.map(p =>
      dir.getFileSystem.getPathMatcher(s"glob:$p"))
    val stream = Files.walk(dir)
    try {
      stream.iterator().asScala
        .filter(Files.isRegularFile(_))
        .map(p => dir.relativize(p))
        .filter(rel => matcher.forall(_.matches(rel)))
        .map(rel => StagedFile(rel.toString, Files.size(dir.resolve(rel))))
        .toVector
        .sortBy(_.relativePath)
    } finally stream.close()
  }

  /** REMOVE a single staged file; true if it existed. */
  def remove(stageName: String, relPath: String): Boolean =
    Files.deleteIfExists(sanitize(s"$stageName/$relPath"))

  /** Stage names = top-level directories under the stage root. */
  def listStages(): Seq[String] = {
    if (!Files.isDirectory(root)) return Nil
    val stream = Files.list(root)
    try stream.iterator().asScala.filter(Files.isDirectory(_))
      .map(_.getFileName.toString).toVector.sorted
    finally stream.close()
  }

  /** Drop the whole stage directory. */
  def dropStage(stageName: String): Unit = {
    val dir = sanitize(stageName)
    if (Files.exists(dir)) {
      val stream = Files.walk(dir)
      try stream.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
      finally stream.close()
    }
  }
}
