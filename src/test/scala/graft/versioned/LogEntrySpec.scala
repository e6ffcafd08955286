package graft.versioned

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.versioned.VersionedTable.{ColStats, LogEntry}

/** JSON round-trip law for the manifest log's on-disk records: every
  * entry [[LogEntry.toJson]] emits must parse back to itself through
  * [[LogEntry.fromJson]] — including hostile file names and stat values
  * (quotes, backslashes, control chars, non-ASCII), both entry shapes
  * (snapshot and delta), null/marker stats, and empty lists. The codec
  * is hand-rolled, so the property is the safety net a library parser
  * would have provided.
  */
class LogEntrySpec extends AnyFunSuite with Matchers {

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("v", StringType)))

  private val nastyString: Gen[String] = Gen.listOf(Gen.oneOf(
    Gen.alphaNumChar,
    Gen.oneOf('"', '\\', '\n', '\t', '\u0001', '/', 'é', '∂', '高'),
    Gen.asciiPrintableChar)).map(_.mkString.take(24))

  private val statVal: Gen[Option[(String, String)]] = Gen.oneOf(
    Gen.const(None),
    Gen.const(Some(("?", "?"))),
    Gen.zip(nastyString.map("s:" + _), nastyString.map("s:" + _)).map(Some(_)),
    Gen.const(Some(("n:-12.5", "n:4300000000"))))

  private val colStats: Gen[ColStats] =
    Gen.mapOf(Gen.zip(nastyString.suchThat(_.nonEmpty), statVal))

  private def fileNames(n: Int): Gen[List[String]] =
    Gen.listOfN(n, nastyString.suchThat(_.nonEmpty)).map(_.distinct)

  private val entry: Gen[LogEntry] = for {
    v <- Gen.chooseNum(0L, 1000000L)
    op <- Gen.oneOf("APPEND", "UPDATE", "RESTORE(v3)", nastyString.sample
      .getOrElse("OP"))
    isSnap <- Gen.oneOf(true, false)
    fs <- fileNames(4)
    rm <- fileNames(2)
    stats <- Gen.mapOf(Gen.zip(Gen.oneOf(fs :+ "other"), colStats))
  } yield
    if (isSnap) LogEntry(v, op, schema, Some(fs), Nil, Nil,
      stats.filter { case (k, _) => fs.contains(k) })
    else LogEntry(v, op, schema, None, fs, rm,
      stats.filter { case (k, _) => fs.contains(k) })

  test("toJson/fromJson round-trips both entry shapes with hostile strings") {
    val cases = (0 until 200).flatMap(i =>
      entry(Gen.Parameters.default.withSize(20), Seed(7L + i)))
    cases should not be empty
    cases.foreach { e =>
      val back = LogEntry.fromJson(e.toJson)
      back.version shouldBe e.version
      back.operation shouldBe e.operation
      back.schema shouldBe e.schema
      back.snapshot shouldBe e.snapshot
      back.add shouldBe e.add
      back.remove shouldBe e.remove
      back.stats shouldBe e.stats
    }
  }

  test("a parsed legacy (pre-stats) snapshot reads with empty stats") {
    val json = """{"version":3,"operation":"APPEND",""" +
      s""""schemaJson":"${schema.json.replace("\"", "\\\"")}",""" +
      """"files":["data/b0001/a.parquet"]}"""
    val e = LogEntry.fromJson(json)
    e.snapshot shouldBe Some(Seq("data/b0001/a.parquet"))
    e.stats shouldBe Map.empty
  }
}
