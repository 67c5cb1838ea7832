package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** O18 progress meter: the SparkListener accumulates executor output
  * metrics during a real write (the reference's live rows/MiB/rows-per-
  * second meter, cli/src/parquet_writer.rs:107-151). */
class ProgressSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  test("listener accumulates rows and bytes from a real write") {
    val listener = new ParquetSink.Progress(quiet = true)
    spark.sparkContext.addSparkListener(listener)
    val out = Files.createTempDirectory("progress").toString + "/t"
    try {
      val stats = ParquetSink.write(spark.range(10000).toDF("id"), out)
      // listener events are delivered asynchronously; poll briefly
      val deadline = System.nanoTime() + 30e9.toLong
      while (listener.rows.get() < 10000 && System.nanoTime() < deadline)
        Thread.sleep(50)
      assert(listener.rows.get() == 10000)
      assert(listener.rows.get() == stats.rows)   // meter agrees with footers
      assert(listener.bytes.get() > 0)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("final summary line prints when not quiet") {
    val out = Files.createTempDirectory("progress2").toString + "/t"
    val buf = new java.io.ByteArrayOutputStream()
    val orig = System.err
    System.setErr(new java.io.PrintStream(buf, true))
    try ParquetSink.write(spark.range(100).toDF("id"), out,
      ParquetSink.SinkOptions(quiet = false))
    finally System.setErr(orig)
    val text = buf.toString
    assert(text.contains("[sink] done: 100 rows"), s"stderr was: $text")
  }
}
