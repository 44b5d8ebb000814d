package graft.sources

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import graft.SparkSpec

/** Pins the checksum-free `rawlocal://` scheme the streaming parity
  * harness routes its throwaway checkpoints through (optimization r17):
  * the operations Spark's CheckpointFileManager and the HDFS-backed
  * state store actually perform — create, rename (the atomic-commit
  * primitive), list, open, delete — must work under the scheme, and the
  * point of the class must hold: NO `.crc` twin is written (the default
  * `file://` ChecksumFileSystem writes one per file, doubling the file
  * ops per micro-batch commit). */
class RawLocalCkptFsSpec extends SparkSpec {

  test("rawlocal:// round-trips checkpoint-manager file ops without .crc twins") {
    val dir = Files.createTempDirectory("rawlocal-spec").toFile
    try {
      val hc = spark.sessionState.newHadoopConf()
      val p = new Path(s"rawlocal://${dir.getAbsolutePath}/sub/delta.1")
      val fs = p.getFileSystem(hc)
      assert(fs.isInstanceOf[RawLocalCkptFs],
        s"fs.rawlocal.impl not engaged: got ${fs.getClass}")
      // makeQualified must accept the scheme (the reason the subclass
      // exists: RawLocalFileSystem.getUri hardcodes file:///, which
      // fails FileSystem.checkPath for rawlocal:// paths)
      assert(fs.makeQualified(p).toUri.getScheme == "rawlocal")

      // create → write → rename (temp-then-rename is the checkpoint
      // manager's atomic commit) → list → read back
      val tmp = new Path(s"rawlocal://${dir.getAbsolutePath}/sub/.delta.1.tmp")
      val out = fs.create(tmp, false)
      out.write("state-bytes".getBytes("UTF-8")); out.close()
      assert(fs.rename(tmp, p))
      val in = fs.open(p)
      val buf = new Array[Byte]("state-bytes".length)
      in.readFully(buf); in.close()
      assert(new String(buf, "UTF-8") == "state-bytes")
      assert(fs.listStatus(p.getParent).map(_.getPath.getName).toSet == Set("delta.1"))

      // the point: no checksum twins anywhere in the tree
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles).toSeq.flatten.flatMap(walk)
        else Seq(f)
      val crcs = walk(dir).filter(_.getName.endsWith(".crc"))
      assert(crcs.isEmpty, s"checksum twins written: $crcs")

      // while the default file:// DOES write one for the same sequence
      val cp = new Path(s"file://${dir.getAbsolutePath}/sub/checked.1")
      val cfs = cp.getFileSystem(hc)
      val cout = cfs.create(cp, false)
      cout.write("x".getBytes("UTF-8")); cout.close()
      assert(walk(dir).exists(_.getName.endsWith(".crc")),
        "expected the checksummed default to write a .crc twin " +
          "(otherwise this optimization pins nothing)")

      assert(fs.delete(new Path(s"rawlocal://${dir.getAbsolutePath}/sub"), true))
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rm))
        f.delete(); ()
      }
      rm(dir)
    }
  }
}
