package graft

import java.nio.file.{Files, Paths}

import graft.operators.Multimodal
import graft.sources.TarShards

/** WebDataset-style tar shards: hand-built ustar bytes must round-trip
  * through the pure-JVM parser and the distributed reader, including
  * binary (real PNG) members, and shard bytes must be reproducible.
  */
class TarShardsSpec extends SparkSuite {

  private val gray = Array.tabulate(24)(i => ((i * 37) % 256).toByte)
  private def members(tag: String) = Seq(
    s"$tag-000.txt" -> s"hello from $tag".getBytes("UTF-8"),
    s"$tag-000.png" -> Multimodal.encodePng(gray, 24, 1),
    s"$tag-001.txt" -> ("x" * 700).getBytes("UTF-8")) // spans two data blocks

  test("buildUstar/parseUstar round-trip, reproducible bytes, external readability") {
    val m = members("a")
    val tar = TarShards.buildUstar(m)
    assert(tar.sameElements(TarShards.buildUstar(m)), "identical members => identical bytes")
    val back = TarShards.parseUstar(tar).toSeq
    assert(back.map(_._1) == m.map(_._1))
    back.zip(m).foreach { case ((_, got), (_, exp)) =>
      assert(got.sameElements(exp), "member payload must survive byte-exact")
    }
    // the format really is tar: GNU tar lists the members
    val f = Files.createTempFile("graft_shard", ".tar")
    Files.write(f, tar)
    val out = new String(
      new ProcessBuilder("tar", "-tf", f.toString).start().getInputStream.readAllBytes())
    assert(m.forall { case (n, _) => out.contains(n) }, s"tar -tf output: $out")
  }

  test("writeShards -> read round-trip: shard-parallel egress, stable bytes") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_shard_write").toString
    val rows = (0 until 10).map(i =>
      TarShards.Member((i % 3).toString, f"doc-$i%03d.txt", s"payload $i".getBytes("UTF-8")))
    TarShards.writeShards(rows.toDS(), dir)
    val back = TarShards.read(spark, s"$dir/*.tar").collect()
    assert(back.length == 10)
    assert(back.map(_.shard).distinct.sorted.toSeq ==
      Seq("shard-0.tar", "shard-1.tar", "shard-2.tar"))
    val byName = back.map(m => m.name -> new String(m.content, "UTF-8")).toMap
    (0 until 10).foreach(i => assert(byName(f"doc-$i%03d.txt") == s"payload $i"))
    // reproducibility: re-writing the same membership gives identical files
    val dir2 = Files.createTempDirectory("graft_shard_write2").toString
    TarShards.writeShards(rows.toDS(), dir2)
    Seq(0, 1, 2).foreach { s =>
      val a = Files.readAllBytes(Paths.get(dir, s"shard-$s.tar"))
      val b = Files.readAllBytes(Paths.get(dir2, s"shard-$s.tar"))
      assert(a.sameElements(b), s"shard $s bytes must be reproducible")
    }
  }

  test("distributed read: one row per member, decode composes on binary members") {
    val dir = Files.createTempDirectory("graft_shards")
    Files.write(Paths.get(dir.toString, "shard-000.tar"), TarShards.buildUstar(members("a")))
    Files.write(Paths.get(dir.toString, "shard-001.tar"), TarShards.buildUstar(members("b")))
    val ds = TarShards.read(spark, s"$dir/*.tar")
    val rows = ds.collect()
    assert(rows.length == 6)
    assert(rows.map(_.shard).distinct.sorted.toSeq == Seq("shard-000.tar", "shard-001.tar"))
    // the webdataset multimodal path end-to-end: tar member -> ImageIO
    val png = rows.find(_.name == "a-000.png").get
    val (w, h, _, _) = Multimodal.ImageDecoder.decode(png.content)
    assert((w, h) == (24, 1), "PNG member decodes with real codec")
  }
}
