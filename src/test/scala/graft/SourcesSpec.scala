package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §2.1: format round-trips (csv/json/orc/parquet — the
  * reference's flink-formats surface) and partitioned/bucketed writes
  * (FileSystemTableSink + bucketing for co-located joins).
  */
class SourcesSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.spark
  private def tmp(tag: String) =
    Files.createTempDirectory(s"graft_$tag").toString

  private def nation = graft.engine.Tables
    .load(spark, SparkFixture.sf, "nation")

  test("csv round-trip preserves rows (flink-csv)") {
    val dir = tmp("csv")
    nation.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true")
      .option("inferSchema", "true").csv(dir)
    assert(back.count() === nation.count())
    assert(back.columns.toSet === nation.columns.toSet)
  }

  test("json round-trip preserves rows (flink-json)") {
    val dir = tmp("json")
    nation.write.mode("overwrite").json(dir)
    val back = spark.read.json(dir)
    assert(back.count() === nation.count())
  }

  test("orc round-trip preserves rows and schema (flink-orc)") {
    val dir = tmp("orc")
    nation.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.count() === nation.count())
    assert(back.schema === nation.schema)
  }

  test("partitioned parquet write prunes partitions on read") {
    val dir = tmp("part")
    val orders = graft.engine.Tables.load(spark, SparkFixture.sf, "orders")
      .withColumn("y", year(col("o_orderdate")))
    orders.write.mode("overwrite").partitionBy("y").parquet(dir)
    val pruned = spark.read.parquet(dir).where(col("y") === 2001)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(y"), plan)
    assert(pruned.count() ===
      orders.where(col("y") === 2001).count())
  }

  test("bucketed tables join without a shuffle (co-located join)") {
    val li = graft.engine.Tables.load(spark, SparkFixture.sf, "lineitem")
      .select("l_orderkey", "l_quantity")
    spark.sql("DROP TABLE IF EXISTS li_a")
    spark.sql("DROP TABLE IF EXISTS li_b")
    // DROP TABLE on a fresh in-memory catalog doesn't know about files a
    // previous JVM left in the warehouse — clear the locations too
    for (t <- Seq("li_a", "li_b")) {
      val loc = new java.io.File(
        s"${sys.props("java.io.tmpdir")}/graft_warehouse/$t")
      if (loc.exists())
        org.apache.commons.io.FileUtils.deleteDirectory(loc)
    }
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_a")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_a").as("a")
        .join(spark.table("li_b").as("b"), "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }

  test("avro round-trip preserves rows, schema, timestamps, arrays (flink-avro)") {
    // the spark-avro connector jar is absent in this container, so the
    // format is implemented on the bundled avro-core jars: AvroIO.write
    // (one container file per partition) + AvroDataSource (DSv2 reader)
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft_avro").toString

    // strings + longs
    val nation = graft.engine.Tables.load(spark, SparkFixture.sf, "nation")
    graft.sources.AvroIO.write(nation, s"$dir/nation")
    val nBack = spark.read.format("graft.sources.AvroDataSource")
      .load(s"$dir/nation")
    assert(nBack.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      nation.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(nBack.collect().map(_.toSeq).toSet ===
      nation.collect().map(_.toSeq).toSet)

    // timestamps (micros precision) + doubles
    val events = graft.engine.Tables.load(spark, SparkFixture.sf, "events")
      .select(col("event_id"), col("ts"), col("value")).limit(200)
    graft.sources.AvroIO.write(events, s"$dir/events")
    val eBack = spark.read.format("graft.sources.AvroDataSource")
      .load(s"$dir/events")
    assert(eBack.collect().map(_.toSeq).toSet ===
      events.collect().map(_.toSeq).toSet)

    // float arrays
    val emb = graft.engine.Tables.load(spark, SparkFixture.sf, "embeddings")
      .limit(50)
    graft.sources.AvroIO.write(emb, s"$dir/emb")
    val aBack = spark.read.format("graft.sources.AvroDataSource")
      .load(s"$dir/emb")
    assert(aBack.collect().map(r =>
        (r.getLong(0), r.getSeq[Float](1), r.getInt(2))).toSet ===
      emb.collect().map(r =>
        (r.getLong(0), r.getSeq[Float](1), r.getInt(2))).toSet)

    // column pruning reaches the avro scan's conversion schema
    val pruned = spark.read.format("graft.sources.AvroDataSource")
      .load(s"$dir/nation").select("n_name")
    // BatchScan prints the pruned output attributes: exactly n_name
    val scanLine = pruned.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("BatchScan")).get
    assert(scanLine.matches(""".*BatchScan avro:.*\[n_name#\d+\].*"""),
      s"column pruning did not reach the avro scan: $scanLine")
    assert(pruned.collect().length === nation.count())
  }

  test("avro logical types round-trip: decimal, date, map, nested record") {
    // reference AvroSchemaConverter.java covers the full avro spec; these
    // are the logical types the round-3 verdict flagged as missing
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_avro_lt").toString
    val df = spark.range(20).select(
      col("id"),
      (col("id").cast("decimal(12,3)") * 1.25).cast("decimal(14,3)")
        .as("dec"),
      date_add(lit(java.sql.Date.valueOf("2020-01-15")),
        col("id").cast("int")).as("d"),
      map(lit("a"), col("id"), lit("b"), col("id") * 2).as("m"),
      struct(col("id").as("x"),
        concat(lit("s"), col("id")).as("y"),
        struct((col("id") % 3).cast("int").as("z")).as("inner"))
        .as("rec"),
      array(struct(col("id").as("p"), lit("q").as("q"))).as("recs"))
    graft.sources.AvroIO.write(df, s"$dir/lt")
    val back = spark.read.format("graft.sources.AvroDataSource")
      .load(s"$dir/lt")
    // reader surfaces everything nullable (the writer's union contract)
    def dt(s: org.apache.spark.sql.types.StructType) =
      s.fields.map(f =>
        (f.name, f.dataType.sql.replace(" NOT NULL", ""))).toSeq
    assert(dt(back.schema) === dt(df.schema))
    assert(back.collect().map(_.toString).sorted.toSeq ===
      df.collect().map(_.toString).sorted.toSeq)
    // column pruning still reaches the scan with the new types present
    val scanLine = back.select("dec").queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("BatchScan")).get
    assert(scanLine.matches(""".*BatchScan avro:.*\[dec#\d+\].*"""), scanLine)
    // job-level completion marker stamped by the driver
    assert(new java.io.File(s"$dir/lt", "_SUCCESS").exists())
  }

  test("avro reader decodes foreign time encodings and rejects drifted dirs") {
    // files written by OTHER writers may use timestamp-millis /
    // time-millis; the reader must follow the file's declared encoding
    import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val dir = java.nio.file.Files.createTempDirectory("graft_avro_ms").toFile
    val tsMillis = LogicalTypes.timestampMillis()
      .addToSchema(Schema.create(Schema.Type.LONG))
    val timeMillis = LogicalTypes.timeMillis()
      .addToSchema(Schema.create(Schema.Type.INT))
    val enumSch = SchemaBuilder.enumeration("color")
      .symbols("RED", "GREEN", "BLUE")
    val fixedSch = SchemaBuilder.fixed("f4").size(4)
    val decArr = Schema.createArray(
      LogicalTypes.decimal(10, 2).addToSchema(Schema.create(Schema.Type.BYTES)))
    val sch = SchemaBuilder.record("r").fields()
      .name("ts").`type`(tsMillis).noDefault()
      .name("t").`type`(timeMillis).noDefault()
      .name("c").`type`(enumSch).noDefault()
      .name("fx").`type`(fixedSch).noDefault()
      .name("ds").`type`(decArr).noDefault()
      .endRecord()
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](sch))
    w.create(sch, new java.io.File(dir, "part-00000.avro"))
    val rec = new GenericData.Record(sch)
    rec.put("ts", 1700000000123L) // epoch millis
    rec.put("t", 12 * 3600 * 1000) // noon, millis since midnight
    rec.put("c", new GenericData.EnumSymbol(enumSch, "GREEN"))
    rec.put("fx", new GenericData.Fixed(fixedSch,
      Array[Byte](1, 2, 3, 4)))
    rec.put("ds", java.util.Arrays.asList(
      java.nio.ByteBuffer.wrap( // 12.34 unscaled at scale 2
        java.math.BigDecimal.valueOf(1234, 0).unscaledValue().toByteArray)))
    w.append(rec); w.close()
    val back = spark.read.format("graft.sources.AvroDataSource")
      .load(dir.toString).collect()
    assert(back.head.getTimestamp(0).getTime === 1700000000123L)
    assert(back.head.getInt(1) === 12 * 3600 * 1000)
    assert(back.head.getString(2) === "GREEN") // enum → string
    assert(back.head.getAs[Array[Byte]](3).toSeq === Seq[Byte](1, 2, 3, 4))
    assert(back.head.getSeq[java.math.BigDecimal](4).head ===
      new java.math.BigDecimal("12.34"))

    // a second file with a drifted schema must fail at planning, naming it
    val sch2 = SchemaBuilder.record("r").fields()
      .name("ts").`type`().stringType().noDefault()
      .endRecord()
    val w2 = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](sch2))
    w2.create(sch2, new java.io.File(dir, "part-00001.avro"))
    val rec2 = new GenericData.Record(sch2)
    rec2.put("ts", "drift"); w2.append(rec2); w2.close()
    val err = intercept[IllegalArgumentException] {
      spark.read.format("graft.sources.AvroDataSource")
        .load(dir.toString).collect()
    }
    assert(err.getMessage.contains("part-00001.avro"))
  }

  test("schema-directed avro write: enum + fixed + fixed-decimal round-trip") {
    // the write(df, path, writerSchemaJson) overload encodes against a
    // TARGET schema declaring types Spark doesn't have — closing the
    // formerly read-only enum/fixed asymmetry
    import org.apache.spark.sql.functions._
    import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
    val dir = java.nio.file.Files.createTempDirectory("graft_avro_sd").toString
    val df0 = spark.range(6).select(
      col("id"),
      element_at(array(lit("RED"), lit("GREEN"), lit("BLUE")),
        (col("id") % 3 + 1).cast("int")).as("c"),
      unhex(lpad(hex(col("id")), 8, "0")).as("fx"),
      // negatives exercise the two's-complement sign-extension
      (col("id").cast("decimal(10,2)") - 3.5).cast("decimal(10,2)").as("dec"))
    // the target declares c/fx/dec non-union (non-nullable), so the
    // Spark schema must assert non-nullability up front — computed
    // columns infer nullable=true even when no value can be null
    val df = spark.createDataFrame(df0.rdd,
      org.apache.spark.sql.types.StructType(
        df0.schema.fields.map(_.copy(nullable = false))))
    val enumSch = SchemaBuilder.enumeration("color")
      .symbols("RED", "GREEN", "BLUE")
    val fixedSch = SchemaBuilder.fixed("f4").size(4)
    val fixedDec = LogicalTypes.decimal(10, 2)
      .addToSchema(SchemaBuilder.fixed("d8").size(8))
    val target = SchemaBuilder.record("row").fields()
      .name("id").`type`().unionOf().nullType().and().longType()
        .endUnion().noDefault()
      .name("c").`type`(enumSch).noDefault()
      .name("fx").`type`(fixedSch).noDefault()
      .name("dec").`type`(fixedDec).noDefault()
      .endRecord()
    graft.sources.AvroIO.write(df, s"$dir/sd", target.toString)
    // the container files really declare ENUM/FIXED (not string/bytes)
    val f0 = new java.io.File(s"$dir/sd").listFiles()
      .filter(_.getName.endsWith(".avro")).minBy(_.getName)
    val written = {
      val r = new org.apache.avro.file.DataFileReader[Any](f0,
        new org.apache.avro.generic.GenericDatumReader[Any]())
      try r.getSchema finally r.close()
    }
    assert(written.getField("c").schema.getType === Schema.Type.ENUM)
    assert(written.getField("fx").schema.getType === Schema.Type.FIXED)
    assert(written.getField("dec").schema.getType === Schema.Type.FIXED)
    assert(written.getField("dec").schema.getLogicalType
      .isInstanceOf[LogicalTypes.Decimal])
    // and the DSv2 reader round-trips the values
    val back = spark.read.format("graft.sources.AvroDataSource")
      .load(s"$dir/sd").orderBy("id").collect()
    val want = df.orderBy("id").collect()
    assert(back.map(_.getLong(0)).toSeq === want.map(_.getLong(0)).toSeq)
    assert(back.map(_.getString(1)).toSeq === want.map(_.getString(1)).toSeq)
    assert(back.map(_.getAs[Array[Byte]](2).toSeq).toSeq ===
      want.map(_.getAs[Array[Byte]](2).toSeq).toSeq)
    assert(back.map(_.getDecimal(3)).toSeq === want.map(_.getDecimal(3)).toSeq)
    // a non-symbol value fails the task naming value and enum
    val bad0 = spark.range(1).select(col("id"), lit("MAUVE").as("c"),
      unhex(lit("00000000")).as("fx"),
      lit(1.5).cast("decimal(10,2)").as("dec"))
    val bad = spark.createDataFrame(bad0.rdd,
      org.apache.spark.sql.types.StructType(
        bad0.schema.fields.map(_.copy(nullable = false))))
    val e = intercept[Exception] {
      SparkFixture.quietExpectedTaskFailures {
        graft.sources.AvroIO.write(bad, s"$dir/bad", target.toString)
      }
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else s"${t.getMessage} ${msgs(t.getCause)}"
    assert(msgs(e).contains("not a symbol"))
    // an incompatible schema fails AT THE DRIVER, before any task runs
    val missing = intercept[IllegalArgumentException] {
      graft.sources.AvroIO.write(
        df.withColumnRenamed("c", "zzz"), s"$dir/bad2", target.toString)
    }
    assert(missing.getMessage.contains("zzz"))
    // nullability is part of the driver-side contract: a NULLABLE Spark
    // column against a non-union target is rejected before any task
    // writes partial output (a null would otherwise fail per-row)
    val nullable = intercept[IllegalArgumentException] {
      graft.sources.AvroIO.write(df0, s"$dir/bad3", target.toString)
    }
    assert(nullable.getMessage.contains("null union branch"))
    // strictNullability=false opts back into per-row semantics: the
    // nullable-TYPED but null-FREE frame (the common computed-column
    // case) writes fine without the createDataFrame retag…
    graft.sources.AvroIO.write(df0, s"$dir/lenient", target.toString,
      strictNullability = false)
    val lenientBack = spark.read.format("graft.sources.AvroDataSource")
      .load(s"$dir/lenient").orderBy("id").collect()
    assert(lenientBack.map(_.getLong(0)).toSeq ===
      want.map(_.getLong(0)).toSeq)
    // …while an ACTUAL null still fails in the task (fail-on-first-null,
    // the pre-r6 behavior the flag preserves)
    val withNull = df0.withColumn("c",
      when(col("id") === 1, lit(null)).otherwise(col("c")))
    intercept[Exception] {
      SparkFixture.quietExpectedTaskFailures {
        graft.sources.AvroIO.write(withNull, s"$dir/bad4", target.toString,
          strictNullability = false)
      }
    }
  }

  test("file metadata columns surface provenance (SupportsReadingMetadata)") {
    // SURVEY §2.1 source abilities: the reference's
    // SupportsReadingMetadata exposes connector metadata as virtual
    // columns; Spark's file sources expose the hidden _metadata struct.
    // Provenance columns are how a 100 TB ingestion pipeline tracks
    // which input file produced each row (dead-lettering, re-ingestion).
    import org.apache.spark.sql.functions.col
    val df = spark.read.parquet(s"${SparkFixture.sf}/documents.parquet")
      .select(col("doc_id"), col("_metadata.file_path").as("src_file"),
        col("_metadata.file_size").as("src_size"))
    val row = df.limit(1).collect().head
    assert(row.getString(1).endsWith("documents.parquet"))
    assert(row.getLong(2) > 0L)
    // metadata projection must not widen the data read: only doc_id is a
    // real column in the scan's ReadSchema
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<doc_id:bigint>"),
      s"metadata columns must not widen the scan:\n$plan")
  }

  private val derbyUrl = "jdbc:derby:memory:graft_jdbc;create=true"
  private def derbyProps = {
    val p = new java.util.Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }

  test("jdbc connector: write, read with pushdown, partitioned " +
      "parallel read (embedded Derby, zero egress)") {
    // the reference's JDBC connector surface (flink-connector-jdbc)
    // through Spark's built-in JDBC source against the Derby that ships
    // in the Spark distribution — in-process, so the zero-egress
    // container constraint holds; a networked url works identically
    import org.apache.spark.sql.functions.col
    val dim = spark.range(100).selectExpr("id AS k",
      "CAST(id % 7 AS INT) AS seg", "CONCAT('n_', id) AS name")
    // Derby's default StringType mapping is CLOB (not comparable) —
    // the explicit VARCHAR is the standard dialect override
    dim.write.mode("overwrite")
      .option("createTableColumnTypes", "name VARCHAR(64)")
      .jdbc(derbyUrl, "DIM", derbyProps)
    val back = spark.read.jdbc(derbyUrl, "DIM", derbyProps)
    assert(back.count() === 100)
    assert(back.where(col("name") === "n_7").select("seg")
      .head().getInt(0) === 0)
    // filter pushdown: the predicate reaches the JDBC scan, not a
    // Spark-side filter over a full-table read
    val filtered = back.where(col("k") < 10)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:") && plan.contains("LessThan"),
      s"JDBC pushdown missing:\n$plan")
    assert(filtered.count() === 10)
    // partitioned read: 4 range-sliced queries run in parallel — the
    // scale path for a large dimension snapshot
    val part = spark.read.jdbc(derbyUrl, "DIM", "k", 0L, 100L, 4,
      derbyProps)
    assert(part.rdd.getNumPartitions === 4)
    assert(part.count() === 100)
  }

  test("jdbc lookup client: batched point reads against a real store " +
      "equal the broadcast join") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._
    val dim = spark.range(100).selectExpr("id AS k",
      "CAST(id % 7 AS INT) AS seg", "CONCAT('n_', id) AS name")
    dim.write.mode("overwrite")
      .option("createTableColumnTypes", "name VARCHAR(64)")
      .jdbc(derbyUrl, "DIM2", derbyProps)
    val probe = spark.range(300)
      .selectExpr("id AS row_id", "id % 150 AS k").repartition(3)
    val vs = StructType(Seq(StructField("name", StringType),
      StructField("seg", IntegerType)))
    val got = graft.operators.LookupJoin.lookupJoin(probe.toDF(), "k",
        new graft.operators.LookupJoin.JdbcLookupClient(
          derbyUrl, "DIM2", "k", Seq("name", "seg"), inClauseLimit = 32),
        vs, "left", batchSize = 64)
      .select("row_id", "name", "seg").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) null else r.getInt(2))).toSet
    val want = probe.join(
        org.apache.spark.sql.functions.broadcast(dim), Seq("k"), "left")
      .select("row_id", "name", "seg").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) null else r.getInt(2))).toSet
    assert(got === want)
    // misses (k in 100..149) came back as nulls, hits as values
    assert(got.exists(_._2 == null) && got.exists(_._2 != null))
  }
}
