package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.SparkSpec

/** Pins the restart-wedge fix: a ledger path that EXISTS but holds no
  * data files (crash between the output committer's mkdir and the first
  * part-file commit, or a dir left with only `_temporary`/`_SUCCESS`)
  * must read as an EMPTY ledger, not throw `Unable to infer schema` on
  * every subsequent batch — the at-least-once posture demands restarts
  * resume, never wedge. */
class LedgerIOSpec extends SparkSpec {

  private val schema = StructType(Seq(StructField("chunk_md5", StringType)))

  private def tmp(): java.io.File =
    Files.createTempDirectory("graft_ledgerio").toFile

  test("missing path reads as empty with the caller's schema") {
    val dir = new java.io.File(tmp(), "never_written")
    val df = LedgerIO.readOrEmpty(spark, dir.getPath, schema)
    assert(df.schema == schema && df.count() == 0L)
  }

  test("exists-but-fileless path reads as empty (the restart wedge)") {
    val dir = new java.io.File(tmp(), "ledger")
    assert(dir.mkdirs())
    val df = LedgerIO.readOrEmpty(spark, dir.getPath, schema)
    assert(df.schema == schema && df.count() == 0L)
  }

  test("dir holding only committer droppings (_SUCCESS, _temporary) reads as empty") {
    val dir = new java.io.File(tmp(), "ledger")
    assert(new java.io.File(dir, "_temporary").mkdirs())
    Files.write(new java.io.File(dir, "_SUCCESS").toPath, Array.empty[Byte])
    val df = LedgerIO.readOrEmpty(spark, dir.getPath, schema)
    assert(df.schema == schema && df.count() == 0L)
  }

  test("a chunk-ledger batch resumes over a fileless ledger dir end-to-end") {
    import spark.implicits._
    val root = tmp()
    val out = new java.io.File(root, "out").getPath
    val ledger = new java.io.File(root, "ledger")
    assert(ledger.mkdirs()) // the wedge precondition: dir exists, no files
    val batch = Seq(("d1", "alpha beta gamma " * 40)).toDF("doc_id", "text")
    StreamingChunkLedger.chunkBatch(batch, out, ledger.getPath) // must not throw
    assert(spark.read.parquet(out).count() == 1L)
    assert(spark.read.parquet(ledger.getPath).count() > 0L)
  }
}
