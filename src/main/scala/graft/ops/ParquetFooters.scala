package graft.ops

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Driver-side parquet METADATA reads for the IVF index lifecycle ops: row
  * counts and the (tiny) centroid sidecar come straight from file footers —
  * a few KB of I/O per file, no Spark job, no scheduling round-trip. At
  * bench scale each avoided job is ~0.1-0.3 s of fixed cost; at production
  * scale these reads are bounded by file COUNT (cells x filesPerCell), never
  * by data volume, so the driver cost stays trivial on a 100 TB index.
  */
private[ops] object ParquetFooters {

  /** Sum of footer record counts across `files` — bit-identical to what a
    * Spark `count()` over the same files resolves from (parquet counts come
    * from footer metadata either way).
    */
  def recordCount(conf: Configuration, files: Seq[Path]): Long =
    files.iterator.map { p =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try r.getRecordCount finally r.close()
    }.sum

  /** Writes an `(idx int, centroid array<double>)` sidecar file in the same
    * standard 3-level list layout Spark writes, so both [[readCentroids]]
    * and a Spark parquet read consume it unchanged. Returns the file path;
    * callers verify by read-back and fall back to a Spark write on any
    * mismatch.
    */
  def writeCentroids(conf: Configuration, dir: Path,
      centroids: Array[Array[Double]]): Path = {
    val schema = org.apache.parquet.schema.MessageTypeParser.parseMessageType(
      """message spark_schema {
        |  required int32 idx;
        |  required group centroid (LIST) {
        |    repeated group list {
        |      required double element;
        |    }
        |  }
        |}""".stripMargin)
    val fs = dir.getFileSystem(conf)
    if (fs.exists(dir)) fs.delete(dir, true)
    fs.mkdirs(dir)
    val file = new Path(dir, "part-00000-centroids.parquet")
    val writer = org.apache.parquet.hadoop.example.ExampleParquetWriter
      .builder(org.apache.parquet.hadoop.util.HadoopOutputFile.fromPath(file, conf))
      .withConf(conf)
      .withType(schema)
      .build()
    try {
      val factory = new org.apache.parquet.example.data.simple.SimpleGroupFactory(schema)
      centroids.zipWithIndex.foreach { case (c, i) =>
        val g = factory.newGroup()
        g.add("idx", i)
        val lst = g.addGroup("centroid")
        c.foreach(v => lst.addGroup("list").add("element", v))
        writer.write(g)
      }
    } finally writer.close()
    file
  }

  /** Reads an `(idx int, centroid array<double>)` sidecar file written by
    * Spark (standard 3-level list layout) via the parquet example Group API.
    * Returns (idx, centroid) pairs in file order; the caller sorts. Throws
    * on any unexpected shape — callers fall back to a Spark read.
    */
  def readCentroids(conf: Configuration, file: Path): Seq[(Int, Array[Double])] = {
    val reader = org.apache.parquet.hadoop.ParquetReader
      .builder(new org.apache.parquet.hadoop.example.GroupReadSupport(), file)
      .withConf(conf)
      .build()
    try {
      val out = scala.collection.mutable.ArrayBuffer[(Int, Array[Double])]()
      var g = reader.read()
      while (g != null) {
        val idx = g.getInteger("idx", 0)
        // centroid (LIST) -> repeated group "list" -> "element" double
        val lst = g.getGroup("centroid", 0)
        val n = lst.getFieldRepetitionCount(0)
        val arr = new Array[Double](n)
        var i = 0
        while (i < n) { arr(i) = lst.getGroup(0, i).getDouble(0, 0); i += 1 }
        out += ((idx, arr))
        g = reader.read()
      }
      out.toSeq
    } finally reader.close()
  }
}
