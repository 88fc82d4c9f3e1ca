package graft.dag

import java.nio.file.{Files, Paths}

import graft.SparkSpec

class PackagesSpec extends SparkSpec {

  private def project(name: String): String = {
    val d = s"target/scratch/packages_spec/$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d))
    Files.createDirectories(Paths.get(d))
    d
  }

  describe("packages.yml round-trip") {
    it("writes and reads back local + hub specs with versions") {
      val proj = project("roundtrip")
      val specs = Seq(
        Packages.PackageSpec("local_pkg", Some("/tmp/x/local_pkg"), Some("0.2.0")),
        Packages.PackageSpec("dbt_utils", None, Some("1.1.1")))
      Packages.writePackagesFile(proj, specs)
      Packages.readPackagesFile(proj) shouldBe specs
    }
  }

  describe("install") {
    it("copies a local package's model tree into dbt_packages/") {
      val proj = project("install")
      val src = Paths.get(s"$proj/mypkg/models")
      Files.createDirectories(src)
      Files.writeString(src.resolve("m1.sql"), "SELECT 1 AS one")
      Files.writeString(src.resolve("m2.sql"), "SELECT * FROM ref('m1')")
      Packages.writePackagesFile(proj,
        Seq(Packages.PackageSpec("mypkg", Some(s"$proj/mypkg"))))
      val installed = Packages.install(proj)
      installed.map(_.name) shouldBe Seq("mypkg")
      installed.head.modelFiles shouldBe Seq("models/m1.sql", "models/m2.sql")
      Files.exists(Paths.get(s"$proj/dbt_packages/mypkg/models/m1.sql")) shouldBe true
    }
    it("hub/git packages fail loudly (no network), mirroring offline dbt deps") {
      val proj = project("hub")
      Packages.writePackagesFile(proj,
        Seq(Packages.PackageSpec("dbt_utils", None, Some("1.1.1"))))
      val e = the[IllegalArgumentException] thrownBy Packages.install(proj)
      e.getMessage should include("dbt_utils")
    }
  }

  describe("loadModels") {
    it("namespaces models and rewrites in-package refs; cross-package refs pass through") {
      import spark.implicits._
      val proj = project("load")
      val src = Paths.get(s"$proj/agg/models")
      Files.createDirectories(src)
      Files.writeString(src.resolve("stg.sql"),
        "SELECT k, v FROM {{ source('lake', 'kv') }} WHERE v > 0")
      Files.writeString(src.resolve("sums.sql"),
        "SELECT k, sum(v) AS s FROM {{ ref('stg') }} GROUP BY k")
      Packages.writePackagesFile(proj,
        Seq(Packages.PackageSpec("agg", Some(s"$proj/agg"))))
      Packages.install(proj)
      val pkgModels = Packages.loadModels(proj, "agg")
      pkgModels.map(_.name).sorted shouldBe Seq("agg__stg", "agg__sums")
      SqlModels.refs(pkgModels.find(_.name == "agg__sums").get.sql) shouldBe
        Seq("agg__stg")
      // compose with a project model that refs the packaged model
      val kv = Seq((1, 2), (1, 3), (2, -1), (2, 5)).toDF("k", "v")
      val out = SqlModels.run(spark,
        pkgModels :+ SqlModels.SqlModel("top",
          "SELECT k, s FROM {{ ref('agg__sums') }} WHERE s >= 5"),
        (_, _) => kv)
      out("top").orderBy("k").as[(Int, Long)].collect() shouldBe
        Array((1, 5L), (2, 5L))
    }
  }
}
