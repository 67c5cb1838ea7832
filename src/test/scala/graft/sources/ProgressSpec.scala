package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** O18 progress meter: the SparkListener accumulates executor output
  * metrics during a real write (the reference's live rows/MiB/rows-per-
  * second meter, cli/src/parquet_writer.rs:107-151). */
class ProgressSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  test("listener accumulates its own job group's writes and ONLY those") {
    val sc = spark.sparkContext
    val listener = new ParquetSink.Progress(quiet = true, jobGroup = "prog-test")
    sc.addSparkListener(listener)
    val dir = Files.createTempDirectory("progress").toString
    try {
      // a write under the listener's group: counted
      sc.setJobGroup("prog-test", "progress spec", interruptOnCancel = false)
      spark.range(10000).toDF("id").write.parquet(s"$dir/mine")
      // a concurrent-session write under ANOTHER group: ignored (the
      // pre-r07 context-wide meter summed every job on the context)
      sc.setJobGroup("someone-else", "other job", interruptOnCancel = false)
      spark.range(5000).toDF("id").write.parquet(s"$dir/theirs")
      sc.clearJobGroup()
      // listener events are delivered asynchronously; poll briefly
      val deadline = System.nanoTime() + 30e9.toLong
      while (listener.rows.get() < 10000 && System.nanoTime() < deadline)
        Thread.sleep(50)
      assert(listener.rows.get() == 10000) // not 15000
      assert(listener.bytes.get() > 0)
    } finally sc.removeSparkListener(listener)
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
