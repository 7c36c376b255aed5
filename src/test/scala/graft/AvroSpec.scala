package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Avro

/** From-spec Avro reader vs the Apache Avro JAVA writer (independent
  * implementation, on the Spark classpath) — every fixture here is
  * authored by `org.apache.avro`, never by our code. */
class AvroSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val schemaJson =
    """{"type":"record","name":"Doc","fields":[
         {"name":"id","type":"long"},
         {"name":"title","type":["null","string"]},
         {"name":"score","type":"double"},
         {"name":"flag","type":"boolean"},
         {"name":"tags","type":{"type":"array","items":"string"}},
         {"name":"props","type":{"type":"map","values":"long"}},
         {"name":"kind","type":{"type":"enum","name":"Kind",
            "symbols":["A","B","C"]}},
         {"name":"blob","type":"bytes"},
         {"name":"pin","type":{"type":"fixed","name":"Pin","size":4}},
         {"name":"sub","type":{"type":"record","name":"Sub","fields":[
            {"name":"x","type":"int"},{"name":"y","type":"float"}]}}
       ]}""".stripMargin

  private def writeFixture(codec: String, n: Int): Array[Byte] = {
    import org.apache.avro.Schema
    import org.apache.avro.file.{CodecFactory, DataFileWriter}
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val schema = new Schema.Parser().parse(schemaJson)
    val sub = schema.getField("sub").schema()
    val kind = schema.getField("kind").schema()
    val pin = schema.getField("pin").schema()
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    codec match {
      case "null" => ()
      case "deflate" => w.setCodec(CodecFactory.deflateCodec(6))
      case "snappy" => w.setCodec(CodecFactory.snappyCodec())
    }
    val bos = new java.io.ByteArrayOutputStream()
    w.create(schema, bos)
    (0 until n).foreach { i =>
      val r = new GenericData.Record(schema)
      r.put("id", i.toLong)
      r.put("title", if (i % 3 == 0) null else s"title $i")
      r.put("score", i * 0.5)
      r.put("flag", i % 2 == 0)
      val tags = new java.util.ArrayList[CharSequence]()
      (0 until i % 4).foreach(j => tags.add(s"t$j"))
      r.put("tags", tags)
      val props = new java.util.HashMap[CharSequence, java.lang.Long]()
      props.put("n", i.toLong * 7)
      r.put("props", props)
      r.put("kind", new GenericData.EnumSymbol(kind, Seq("A", "B", "C")(i % 3)))
      r.put("blob", java.nio.ByteBuffer.wrap(Array[Byte](i.toByte, 2, 3)))
      r.put("pin", new GenericData.Fixed(pin,
        Array[Byte](i.toByte, 0, 0, 1)))
      val s = new GenericData.Record(sub)
      s.put("x", i * 3)
      s.put("y", i * 1.5f)
      r.put("sub", s)
      w.append(r)
    }
    w.close()
    bos.toByteArray
  }

  test("header/schemaOf: magic, codec, schema metadata") {
    val blob = writeFixture("deflate", 5)
    val h = Avro.header(blob)
    assert(h != null && h.codec == "deflate")
    assert(h.schemaJson.contains("\"Doc\""))
    assert(Avro.schemaOf("not avro".getBytes) == null)
    assert(Avro.schemaOf(null) == null)
  }

  test("sparkSchema: full type mapping incl. nullable union") {
    val st = Avro.sparkSchema(schemaJson)
    import org.apache.spark.sql.types._
    assert(st.fieldNames.toSeq == Seq("id", "title", "score", "flag",
      "tags", "props", "kind", "blob", "pin", "sub"))
    assert(st("id").dataType == LongType && !st("id").nullable)
    assert(st("title").dataType == StringType && st("title").nullable)
    assert(st("tags").dataType == ArrayType(StringType, containsNull = false))
    assert(st("props").dataType ==
      MapType(StringType, LongType, valueContainsNull = false))
    assert(st("kind").dataType == StringType)
    assert(st("blob").dataType == BinaryType)
    assert(st("pin").dataType == BinaryType)
    assert(st("sub").dataType == StructType(Seq(
      StructField("x", IntegerType, nullable = false),
      StructField("y", FloatType, nullable = false))))
  }

  test("records: decode the Java-written container, all three codecs") {
    Seq("null", "deflate", "snappy").foreach { codec =>
      val rows = Avro.records(writeFixture(codec, 10))
      assert(rows.length == 10, s"$codec: ${rows.length}")
      val r7 = rows(7)
      assert(r7.getLong(0) == 7L)
      assert(r7.getUTF8String(1).toString == "title 7")
      assert(r7.getDouble(2) == 3.5)
      assert(!r7.getBoolean(3))
      assert(r7.getArray(4).numElements == 3)
      assert(r7.getArray(4).getUTF8String(0).toString == "t0")
      val m = r7.getMap(5)
      assert(m.keyArray.getUTF8String(0).toString == "n" &&
        m.valueArray.getLong(0) == 49L)
      assert(r7.getUTF8String(6).toString == "B")
      assert(r7.getBinary(7).toSeq == Seq[Byte](7, 2, 3))
      assert(r7.getBinary(8).toSeq == Seq[Byte](7, 0, 0, 1))
      val sub = r7.getStruct(9, 2)
      assert(sub.getInt(0) == 21 && sub.getFloat(1) == 10.5f)
      // null branch of the union
      assert(rows(6).isNullAt(1))
    }
  }

  test("corrupt tail yields the good prefix; sync mismatch stops") {
    val blob = writeFixture("null", 100)
    // truncate mid-blocks: never throws, yields a prefix
    Seq(blob.length / 2, blob.length - 3, 21, 4, 0).foreach { cut =>
      val rows = Avro.records(java.util.Arrays.copyOfRange(blob, 0, cut))
      assert(rows.length <= 100)
    }
    // flip a sync byte in the tail: decoded rows stop at the bad block
    val mangled = blob.clone()
    mangled(blob.length - 5) = (mangled(blob.length - 5) ^ 0x55).toByte
    assert(Avro.records(mangled).length < 100)
  }

  test("mixed-schema glob: blob with a different writer schema yields " +
      "zero rows instead of mis-typed ones") {
    val blob = writeFixture("null", 5)
    // same schema (even re-serialized by the Java writer) decodes
    assert(Avro.records(blob, Avro.schemaOf(blob)).length == 5)
    assert(Avro.records(blob, schemaJson).length == 5)
    // a structurally different plan-time schema must refuse the blob
    val other = """{"type":"record","name":"Doc","fields":[
         {"name":"id","type":"long"},{"name":"title","type":"string"}]}"""
    assert(Avro.records(blob, other).isEmpty)
    // unparseable expected schema also refuses rather than mis-decodes
    assert(Avro.records(blob, "not json").isEmpty)
  }

  test("unsupported schemas fail fast at parse, not at decode") {
    intercept[IllegalArgumentException] {
      Avro.parseSchema("""["int","string"]""") // non-null union
    }
    intercept[IllegalArgumentException] {
      Avro.sparkSchema(""""long"""") // not a record at top level
    }
  }

  test("read: distributed decode over files, schema from one header") {
    val dir = java.nio.file.Files.createTempDirectory("avro").toString
    (0 until 3).foreach { f =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/part$f.avro"),
        writeFixture(if (f == 1) "deflate" else "null", 4))
    }
    val df = Avro.read(spark, s"$dir/*.avro")
    assert(df.count() == 12)
    assert(df.columns.toSeq.take(3) == Seq("path", "id", "title"))
    import org.apache.spark.sql.functions._
    val sums = df.agg(sum("id"), sum("sub.x")).collect().head
    assert(sums.getLong(0) == 18L && sums.getLong(1) == 54L)
    // 300-mutation fuzz on a real container: never throws
    val blob = writeFixture("deflate", 6)
    val rnd = new scala.util.Random(42)
    (0 until 300).foreach { _ =>
      val m = blob.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      Avro.records(m)
      Avro.schemaOf(m)
    }
  }

  // ---- writer ------------------------------------------------------------

  /** External-representation rows matching `schemaJson` field order. */
  private def extRows(n: Int): Seq[Seq[Any]] = (0 until n).map { i =>
    Seq[Any](i.toLong,
      if (i % 3 == 0) null else s"title $i",
      i * 0.5, i % 2 == 0,
      (0 until i % 4).map(j => s"t$j"),
      Map("n" -> i.toLong * 7),
      Seq("A", "B", "C")(i % 3),
      Array[Byte](i.toByte, 2, 3),
      Array[Byte](9, 9, 9, i.toByte),
      Seq[Any](i * 3, i * 1.5f))
  }

  test("writeBlob: our reader round-trips all three codecs, multi-block") {
    for (codec <- Seq("null", "deflate", "snappy")) {
      val blob = Avro.writeBlob(schemaJson, extRows(7).iterator,
        codec, blockRows = 3)
      val h = Avro.header(blob)
      assert(h.codec == codec)
      val back = Avro.records(blob)
      assert(back.length == 7)
      (0 until 7).foreach { i =>
        val r = back(i)
        assert(r.getLong(0) == i.toLong)
        if (i % 3 == 0) assert(r.isNullAt(1))
        else assert(r.getUTF8String(1).toString == s"title $i")
        assert(r.getDouble(2) == i * 0.5)
        assert(r.getBoolean(3) == (i % 2 == 0))
        assert(r.getArray(4).numElements() == i % 4)
        assert(r.getMap(5).valueArray().getLong(0) == i.toLong * 7)
        assert(r.getUTF8String(6).toString == Seq("A", "B", "C")(i % 3))
        assert(r.getBinary(7).toSeq == Seq[Byte](i.toByte, 2, 3))
        assert(r.getBinary(8).toSeq == Seq[Byte](9, 9, 9, i.toByte))
        assert(r.getStruct(9, 2).getInt(0) == i * 3)
        assert(r.getStruct(9, 2).getFloat(1) == i * 1.5f)
      }
    }
  }

  test("writeBlob: the independent Apache reader decodes our containers") {
    import org.apache.avro.file.{DataFileReader, SeekableByteArrayInput}
    import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
    for (codec <- Seq("null", "deflate", "snappy")) {
      val blob = Avro.writeBlob(schemaJson, extRows(5).iterator,
        codec, blockRows = 2)
      val r = new DataFileReader[GenericRecord](
        new SeekableByteArrayInput(blob),
        new GenericDatumReader[GenericRecord]())
      var i = 0
      while (r.hasNext) {
        val rec = r.next()
        assert(rec.get("id").asInstanceOf[Long] == i.toLong)
        if (i % 3 == 0) assert(rec.get("title") == null)
        else assert(rec.get("title").toString == s"title $i")
        assert(rec.get("score").asInstanceOf[Double] == i * 0.5)
        assert(rec.get("tags").asInstanceOf[java.util.List[_]].size == i % 4)
        assert(rec.get("props").asInstanceOf[java.util.Map[_, _]]
          .values.iterator.next().asInstanceOf[Long] == i.toLong * 7)
        assert(rec.get("kind").toString == Seq("A", "B", "C")(i % 3))
        assert(rec.get("sub").asInstanceOf[GenericRecord]
          .get("x").asInstanceOf[Int] == i * 3)
        i += 1
      }
      r.close()
      assert(i == 5)
    }
  }

  test("writeBlob: deterministic bytes — reruns produce identical files") {
    val a = Avro.writeBlob(schemaJson, extRows(6).iterator, "deflate")
    val b = Avro.writeBlob(schemaJson, extRows(6).iterator, "deflate")
    assert(java.util.Arrays.equals(a, b))
    val c = Avro.writeBlob(schemaJson, extRows(6).iterator, "deflate",
      syncSalt = "other")
    assert(!java.util.Arrays.equals(a, c)) // salt reaches the sync marker
  }

  test("write/read: executor-side directory sink round-trips a DataFrame") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = (0 until 40).map { i =>
      (i.toLong, if (i % 5 == 0) None else Some(s"n$i"), i * 0.25,
        (0 until i % 3).map(_.toString), Map("k" -> i.toLong))
    }.toDF("id", "name", "score", "tags", "props").repartition(4)
    val dir = java.nio.file.Files.createTempDirectory("avrosink").toString
    val schemaJson = Avro.write(df, dir, codec = "deflate")
    assert(schemaJson.contains("\"name\":\"SparkRow\""))
    val files = new java.io.File(dir).listFiles().filter(
      _.getName.endsWith(".avro"))
    assert(files.length >= 2) // one file per non-empty partition
    val back = Avro.read(spark, s"$dir/*.avro").drop("path")
    assert(back.count() == 40)
    val agg = back.agg(sum("id"), sum("score"),
      count(when(col("name").isNull, 1)), sum(size(col("tags")))).collect().head
    assert(agg.getLong(0) == 780L && agg.getDouble(1) == 195.0)
    assert(agg.getLong(2) == 8L && agg.getLong(3) == 39L)
  }

  test("avroSchemaJson: unsupported Catalyst types fail fast") {
    import org.apache.spark.sql.types._
    intercept[IllegalArgumentException] {
      Avro.avroSchemaJson(StructType(Seq(
        StructField("t", TimestampType))))
    }
    intercept[IllegalArgumentException] { // non-string map keys
      Avro.avroSchemaJson(StructType(Seq(
        StructField("m", MapType(LongType, LongType)))))
    }
  }
}
