package graft.dag

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** dbt package management — the reference's `write_packages_yml` +
  * `install_packages` (`dbt deps`) surface (datanika
  * `services/dbt_project.py:501-527`). A package is a directory of
  * SQL-text model files plus a spec pinned in the project's
  * packages.yml; install materializes each package under
  * `<project>/dbt_packages/<name>` and its models load as
  * `SqlModels.SqlModel`s, namespaced `<package>__<model>` to avoid
  * collisions (dbt's package-scoped ref is expressed the same way).
  *
  * Only dbt's LOCAL package flavor installs here — hub/git packages
  * need network access (zero egress); specifying one fails loudly
  * instead of silently skipping, mirroring how `dbt deps` would
  * error offline.
  */
object Packages {

  final case class PackageSpec(
      name: String,
      localPath: Option[String] = None,
      version: Option[String] = None)

  final case class Installed(name: String, modelFiles: Seq[String])

  /** Write the project's packages.yml (dbt's on-disk shape). */
  def writePackagesFile(projectDir: String, specs: Seq[PackageSpec]): Path = {
    val dir = Paths.get(projectDir)
    Files.createDirectories(dir)
    val body = new StringBuilder("packages:\n")
    specs.foreach { s =>
      s.localPath match {
        case Some(p) => body.append(s"  - local: $p\n")
        case None    => body.append(s"  - package: ${s.name}\n")
      }
      s.version.foreach(v => body.append(s"    version: $v\n"))
    }
    Files.writeString(dir.resolve("packages.yml"), body.toString)
  }

  /** Parse the subset of packages.yml this module writes. */
  def readPackagesFile(projectDir: String): Seq[PackageSpec] = {
    val f = Paths.get(projectDir).resolve("packages.yml")
    require(Files.exists(f), s"packages.yml not found in $projectDir")
    val specs = Seq.newBuilder[PackageSpec]
    var cur: Option[PackageSpec] = None
    Files.readAllLines(f).asScala.map(_.trim).filter(_.nonEmpty).foreach {
      case l if l.startsWith("- local:") =>
        cur.foreach(specs += _)
        val p = l.stripPrefix("- local:").trim
        cur = Some(PackageSpec(Paths.get(p).getFileName.toString, Some(p)))
      case l if l.startsWith("- package:") =>
        cur.foreach(specs += _)
        cur = Some(PackageSpec(l.stripPrefix("- package:").trim))
      case l if l.startsWith("version:") =>
        cur = cur.map(_.copy(version = Some(l.stripPrefix("version:").trim)))
      case _ => () // "packages:" header / comments
    }
    cur.foreach(specs += _)
    specs.result()
  }

  /** `dbt deps`: install every spec in packages.yml into
    * `<project>/dbt_packages/<name>` and return what landed. Local
    * packages copy their tree of .sql model files; hub/git specs
    * fail (no network).
    */
  def install(projectDir: String): Seq[Installed] = {
    readPackagesFile(projectDir).map { spec =>
      val src = spec.localPath.map(Paths.get(_)).getOrElse(
        throw new IllegalArgumentException(
          s"package '${spec.name}' has no local path — hub/git installs need " +
            "network access, unavailable here"))
      require(Files.isDirectory(src), s"local package path not found: $src")
      val dest = Paths.get(projectDir).resolve("dbt_packages").resolve(spec.name)
      if (Files.exists(dest)) deleteRecursive(dest)
      Files.createDirectories(dest)
      val models = Files.walk(src).iterator().asScala
        .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".sql"))
        .map { p =>
          val rel = src.relativize(p)
          val target = dest.resolve(rel)
          Files.createDirectories(target.getParent)
          Files.copy(p, target, StandardCopyOption.REPLACE_EXISTING)
          rel.toString
        }.toSeq.sorted
      Installed(spec.name, models)
    }
  }

  /** Load an installed package's models as SQL-text models, names
    * namespaced `<package>__<file-stem>`. In-package ref('m') calls
    * rewrite to the namespaced names, so packages can't collide with
    * project models or each other.
    */
  def loadModels(projectDir: String, packageName: String,
      materialization: Dag.Materialization = Dag.Ephemeral): Seq[SqlModels.SqlModel] = {
    val dir = Paths.get(projectDir).resolve("dbt_packages").resolve(packageName)
    require(Files.isDirectory(dir), s"package not installed: $packageName")
    val files = Files.walk(dir).iterator().asScala
      .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".sql"))
      .toSeq.sortBy(_.toString)
    val stems = files.map(f => f.getFileName.toString.stripSuffix(".sql")).toSet
    files.map { f =>
      val stem = f.getFileName.toString.stripSuffix(".sql")
      var sql = Files.readString(f)
      // package-scoped ref resolution: refs to in-package models point
      // at the namespaced name; refs to anything else pass through to
      // the enclosing project's models
      stems.foreach { other =>
        sql = sql.replace(s"ref('$other')", s"ref('${packageName}__$other')")
      }
      SqlModels.SqlModel(s"${packageName}__$stem", sql, materialization)
    }
  }

  private def deleteRecursive(p: Path): Unit = {
    Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)
  }
}
