package graft.ingest

import java.nio.file.{Files, Paths}

import graft.SparkSpec

class LegacyLayoutSpec extends SparkSpec {

  test("reads bare yyyy/mm/dd layout and restores partition columns") {
    val base = Files.createTempDirectory("legacy").toString
    def write(y: String, m: String, d: String, id: Long): Unit = {
      val dir = Paths.get(base, y, m, d)
      Files.createDirectories(dir)
      val json =
        s"""{"id": $id, "name": "r$id", "full_name": "o/r$id",
           | "html_url": "h", "description": "d", "stargazers_count": 1,
           | "language": "Scala", "created_at": "2024-03-05T10:00:00Z",
           | "updated_at": "2024-03-06T11:30:00Z", "owner_login": "u",
           | "owner_id": 1, "owner_type": "User", "owner_avatar_url": "a",
           | "owner_url": "hu"}""".stripMargin.replaceAll("\n", "")
      Files.write(dir.resolve(s"github_repos_$id.json"), json.getBytes)
    }
    write("2024", "03", "06", 1L)
    write("2024", "03", "07", 2L)
    write("2023", "12", "31", 3L)

    val df = LegacyLayout.readJson(spark, base)
    assert(df.count() == 3)
    val r = df.filter("id = 3").collect()(0)
    assert(r.getAs[Int]("year") == 2023)
    assert(r.getAs[Int]("month") == 12)
    assert(r.getAs[Int]("day") == 31)
    // date filtering works on the restored columns
    assert(df.filter("year = 2024 AND month = 3").count() == 2)
  }
}
