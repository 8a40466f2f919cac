package graft.ext

import org.apache.spark.sql.SparkSession

/** Driver-side single-file parquet write for TINY protocol tables (the
  * [[TextIndex]] driver-writer idiom, shared): a handful of rows
  * written through parquet-java directly costs zero Spark jobs, where
  * `df.coalesce(1).write` pays a full scheduler round-trip + commit
  * protocol per table. Strictly for driver-held, provably-small row
  * sets (metadata sinks, watermark batches below the driver bound) —
  * anything distributed keeps the Spark write. Overwrite semantics.
  * Public: the gazetteer ETL ([[graft.etl.GazetteerBuilder]]) writes
  * its meta sink through this. */
object DriverParquet {

  def writeFile(spark: SparkSession, dir: String, schemaStr: String)(
      write: (org.apache.parquet.schema.MessageType,
        org.apache.parquet.hadoop.ParquetWriter[
          org.apache.parquet.example.data.Group]) => Unit): Unit = {
    IndexIO.crashTick() // protocol-level driver write: fuzz kill point
    val conf = spark.sparkContext.hadoopConfiguration
    val schema =
      org.apache.parquet.schema.MessageTypeParser.parseMessageType(schemaStr)
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val fs = dirPath.getFileSystem(conf)
    if (fs.exists(dirPath)) fs.delete(dirPath, true)
    fs.mkdirs(dirPath)
    val w = org.apache.parquet.hadoop.example.ExampleParquetWriter
      .builder(org.apache.parquet.hadoop.util.HadoopOutputFile.fromPath(
        new org.apache.hadoop.fs.Path(dirPath, "part-00000.parquet"), conf))
      .withType(schema).withConf(conf).build()
    try write(schema, w) finally w.close()
  }
}
