package graft.sources

import java.nio.file.{Files, Path}

/** Bundled golden fixtures (src/main/resources), materialized to a temp
  * directory at first use — classpath resources may live inside the
  * packaged jar, which Spark's file sources cannot scan directly.
  */
object Fixtures {

  private val files = Seq(
    "chain/2024-01-15/AAA.json",
    "chainhtml/2024-01-15/AAA.html",
    "chain/2024-01-15/BBB.json",
    "vol/AAA.html",
    "vol/BAD.html",
    "weeklies/weeklyoptions.2024-01-15.csv",
    "weeklies/weeklyoptions.2024-01-22.csv",
    "weeklies/weeklyoptions.2024-02-05.csv")

  private lazy val root: Path = {
    val dir = Files.createTempDirectory("graft_fixtures")
    files.foreach { f =>
      val in = getClass.getClassLoader.getResourceAsStream(f)
      require(in != null, s"fixture not on classpath: $f")
      val target = dir.resolve(f)
      Files.createDirectories(target.getParent)
      Files.copy(in, target)
      in.close()
    }
    dir
  }

  def path(p: String): String = root.resolve(p).toString
}
