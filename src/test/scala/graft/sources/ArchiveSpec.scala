package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSpec

class ArchiveSpec extends SparkSpec {

  private def scratch(name: String): String = {
    val d = s"target/scratch/archive_spec/$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d))
    Files.createDirectories(Paths.get(d))
    d
  }

  describe("tar.gz round-trip") {
    it("extracts exactly the files it packed, bytes intact") {
      val d = scratch("roundtrip")
      val entries = Seq(
        "a.csv" -> "k,v\n1,2\n".getBytes("UTF-8"),
        "sub/b.csv" -> ("x," * 400 + "end\n").getBytes("UTF-8"), // > 1 tar block
        "empty.csv" -> Array.emptyByteArray)
      Archive.createTarGz(entries, s"$d/bundle.tar.gz")
      val names = Archive.extract(s"$d/bundle.tar.gz", s"$d/out")
      names.toSet shouldBe Set("a.csv", "sub/b.csv", "empty.csv")
      entries.foreach { case (n, bytes) =>
        Files.readAllBytes(Paths.get(s"$d/out/$n")) shouldBe bytes
      }
    }
    it("a system-tar archive (if available) extracts identically") {
      val d = scratch("systar")
      Files.writeString(Paths.get(s"$d/f.txt"), "hello world\n")
      val rc = new ProcessBuilder("tar", "czf", s"$d/sys.tar.gz", "-C", d, "f.txt")
        .start().waitFor()
      assume(rc == 0, "system tar unavailable")
      Archive.extractTarGz(s"$d/sys.tar.gz", s"$d/out") should contain("f.txt")
      Files.readString(Paths.get(s"$d/out/f.txt")) shouldBe "hello world\n"
    }
  }

  describe("zip") {
    it("extracts zip entries") {
      val d = scratch("zip")
      val zos = new java.util.zip.ZipOutputStream(
        new java.io.FileOutputStream(s"$d/a.zip"))
      zos.putNextEntry(new java.util.zip.ZipEntry("data/x.csv"))
      zos.write("k\n9\n".getBytes("UTF-8"))
      zos.closeEntry(); zos.close()
      Archive.extract(s"$d/a.zip", s"$d/out") shouldBe Seq("data/x.csv")
      Files.readString(Paths.get(s"$d/out/data/x.csv")) shouldBe "k\n9\n"
    }
  }

  describe("zip-slip protection") {
    it("rejects .. traversal entries in tars") {
      val d = scratch("slip")
      Archive.createTarGz(Seq("../evil.txt" -> "x".getBytes), s"$d/evil.tar.gz")
      an[IllegalArgumentException] should be thrownBy
        Archive.extractTarGz(s"$d/evil.tar.gz", s"$d/out")
      Files.exists(Paths.get(s"$d/evil.txt")) shouldBe false
    }
  }

  describe("FileSource.readBucket") {
    it("maps dlt credential keys onto Hadoop S3A conf and rejects unknown keys") {
      FileSource.applyCredentials(spark, Map(
        "aws_access_key_id" -> "AKIA_X", "endpoint_url" -> "http://minio:9000"))
      val conf = spark.sparkContext.hadoopConfiguration
      conf.get("fs.s3a.access.key") shouldBe "AKIA_X"
      conf.get("fs.s3a.endpoint") shouldBe "http://minio:9000"
      an[IllegalArgumentException] should be thrownBy
        FileSource.applyCredentials(spark, Map("password" -> "x"))
    }
    it("reads a file:// bucket URL with a glob") {
      val d = scratch("bucket")
      Files.writeString(Paths.get(s"$d/t1.csv"), "k,v\n1,a\n2,b\n")
      Files.writeString(Paths.get(s"$d/skip.json"), "{}")
      val bucket = "file://" + new java.io.File(d).getAbsolutePath
      val df = FileSource.readBucket(spark, bucket, "csv")
      df.count() shouldBe 2L
      df.columns shouldBe Array("k", "v")
    }
  }
}
