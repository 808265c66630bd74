package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.operators.Compaction
import graft.sources.FileManifest

/** The small-file compactor: bundle assignment must match a sequential
  * driver-side bin-pack under any partitioning, and the executed
  * bundles must be byte-exact concatenations with seekable sidecars.
  */
class CompactionSpec extends SparkSpec {

  private def mkFixture(n: Int): (String, Seq[(String, Array[Byte])]) = {
    val dir = Files.createTempDirectory("graft-compact").toString
    val files = (0 until n).map { i =>
      // varied sizes so bundles cut at uneven boundaries
      val body = (s"file-$i:" + ("x" * (i % 7 + 1) * 100))
        .getBytes(StandardCharsets.UTF_8)
      val name = f"f$i%03d.dat"
      Files.write(Paths.get(dir, name), body)
      name -> body
    }
    (dir, files)
  }

  test("plan: bundle assignment equals the sequential bin-pack, any partitioning") {
    val (dir, files) = mkFixture(40)
    val target = 2000L
    val manifest = FileManifest.scan(spark, s"file://$dir").toDF()
    val got = Compaction.plan(manifest, target)
      .select("path", "size", "bundle").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)

    var cum = 0L
    val want = files.sortBy(_._1).map { case (name, body) =>
      val b = cum / target; cum += body.length; (name, body.length.toLong, b)
    }
    assert(got.toSeq == want)

    // same plan over a deliberately reshuffled manifest
    val again = Compaction
      .plan(manifest.repartition(7, col("name"))
        .sortWithinPartitions(desc("path")), target)
      .select("path", "bundle").collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    assert(again.toSeq == want.map(w => (w._1, w._3)))
  }

  test("compact: bundles are byte-exact concatenations and the idx seeks correctly") {
    val (dir, files) = mkFixture(25)
    val target = 1500L
    val out = Files.createTempDirectory("graft-compact-out").toString
    val manifest = FileManifest.scan(spark, s"file://$dir").toDF()
    val planned = Compaction.plan(manifest, target)
    val stats = Compaction.compact(planned, s"file://$out", "packed")

    assert(stats.files == files.length)
    assert(stats.bytes == files.map(_._2.length.toLong).sum)
    val bundleIds = planned.select("bundle").distinct()
      .collect().map(_.getLong(0)).sorted
    assert(stats.bundles == bundleIds.length && bundleIds.length > 1)

    val byBundle = planned.select("path", "bundle").collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._2).view.mapValues(_.map(_._1).sorted).toMap
    val bodies = files.toMap
    bundleIds.foreach { b =>
      val bin = Files.readAllBytes(
        Paths.get(out, "packed", f"bundle-$b%05d.bin"))
      val expected = byBundle(b).flatMap(bodies(_)).toArray
      assert(bin.sameElements(expected), s"bundle $b bytes diverge")
      // sidecar: (path, offset, length) rows slice the bin back into
      // the original objects
      val idx = new String(Files.readAllBytes(
        Paths.get(out, "packed", f"bundle-$b%05d.idx")),
        StandardCharsets.UTF_8)
      val entries = idx.split("\n").filter(_.nonEmpty).map { line =>
        val Array(p, o, l) = line.split("\t")
        (p, o.toLong, l.toLong)
      }
      assert(entries.map(_._1).toSeq == byBundle(b).toSeq)
      entries.foreach { case (p, off, len) =>
        assert(bin.slice(off.toInt, (off + len).toInt)
          .sameElements(bodies(p)), s"idx slice for $p diverges")
      }
    }
  }

  test("readBundled round-trips every object; readObject seeks one; missing path maps to 205") {
    val (dir, files) = mkFixture(30)
    val out = Files.createTempDirectory("graft-compact-rt").toString
    val manifest = FileManifest.scan(spark, s"file://$dir").toDF()
    Compaction.compact(Compaction.plan(manifest, 1800L), s"file://$out", "packed")

    val got = Compaction.readBundled(spark, s"file://$out", "packed")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getAs[Array[Byte]](2)))
      .sortBy(_._1)
    val want = files.sortBy(_._1)
    assert(got.map(_._1).toSeq == want.map(_._1))
    got.zip(want).foreach { case ((p, len, body), (_, exp)) =>
      assert(len == exp.length.toLong && body.sameElements(exp),
        s"round-trip bytes diverge for $p")
    }

    val one = files(17)
    assert(Compaction.readObject(spark, s"file://$out", "packed", one._1)
      .sameElements(one._2))
    val err = intercept[graft.core.BlueprintError.FileNotFound] {
      Compaction.readObject(spark, s"file://$out", "packed", "nope.dat")
    }
    assert(err.exitCode == 205)
  }

  test("compactStream: two arrival waves pack incrementally; the store round-trips") {
    val land = Files.createTempDirectory("graft-land").toString
    val out = Files.createTempDirectory("graft-land-out").toString
    val ckpt = Files.createTempDirectory("graft-land-ckpt").toString
    def drop(tag: String, n: Int): Seq[(String, Array[Byte])] =
      (0 until n).map { i =>
        val body = (s"$tag-$i:" + ("y" * (i % 5 + 1) * 120))
          .getBytes(StandardCharsets.UTF_8)
        val name = f"$tag-$i%03d.dat"
        Files.write(Paths.get(land, name), body)
        name -> body
      }

    val wave1 = drop("w1", 9)
    val q1 = Compaction.compactStream(spark, s"file://$land",
      s"file://$out", "packed", 800L, ckpt)
    q1.processAllAvailable(); q1.stop()

    val cat1 = Compaction.catalog(spark, s"file://$out", "packed")
      .select("path").collect().map(_.getString(0)).sorted
    assert(cat1.toSeq == wave1.map(_._1).sorted)

    val wave2 = drop("w2", 6)
    // a fresh query off the same checkpoint resumes the source's file
    // tracking: only wave-2 files are packed
    val q2 = Compaction.compactStream(spark, s"file://$land",
      s"file://$out", "packed", 800L, ckpt)
    q2.processAllAvailable(); q2.stop()

    val all = (wave1 ++ wave2).sortBy(_._1)
    val got = Compaction.readBundled(spark, s"file://$out", "packed")
      .collect()
      .map(r => (r.getString(0), r.getAs[Array[Byte]](2))).sortBy(_._1)
    assert(got.map(_._1).toSeq == all.map(_._1))
    got.zip(all).foreach { case ((p, body), (_, exp)) =>
      assert(body.sameElements(exp), s"streamed round-trip diverges for $p")
    }
    // batch-tagged bundle names: wave 2 never rewrote wave 1's bundles
    val names = Files.list(Paths.get(out, "packed")).toArray
      .map(_.toString.split('/').last).sorted
    assert(names.count(_.endsWith(".bin")) >= 2)
    assert(names.exists(_.startsWith("b0-")) &&
      names.exists(n => n.endsWith(".bin") && !n.startsWith("b0-")))
    // point lookup straight out of the streamed store
    assert(Compaction.readObject(spark, s"file://$out", "packed",
      wave2(3)._1).sameElements(wave2(3)._2))
  }

  test("compact: a retry-shaped re-run rewrites identical bytes (idempotent)") {
    val (dir, _) = mkFixture(12)
    val out = Files.createTempDirectory("graft-compact-re").toString
    val manifest = FileManifest.scan(spark, s"file://$dir").toDF()
    val planned = Compaction.plan(manifest, 1200L)
    Compaction.compact(planned, s"file://$out", "p")
    val first = Files.list(Paths.get(out, "p")).toArray.map(_.toString)
      .sorted.map(p => p -> Files.readAllBytes(Paths.get(p)).toSeq).toMap
    Compaction.compact(planned, s"file://$out", "p")
    val second = Files.list(Paths.get(out, "p")).toArray.map(_.toString)
      .sorted.map(p => p -> Files.readAllBytes(Paths.get(p)).toSeq).toMap
    assert(first == second)
  }
}
