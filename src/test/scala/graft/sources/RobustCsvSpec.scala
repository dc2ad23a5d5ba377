package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructType}

import graft.SparkSuite

/** Every input row is either parsed or explained: good rows come back
  * fully typed, malformed rows land in quarantine with their raw text,
  * and the two partitions tile the file exactly.
  */
class RobustCsvSpec extends SparkSuite {

  private val schema = new StructType()
    .add("id", LongType).add("name", StringType).add("amount", DoubleType)

  test("good rows parse typed; type garbage and column-count drift quarantine") {
    val dir = Files.createTempDirectory("graft_csv").toFile
    val f = new java.io.File(dir, "in.csv")
    val w = new java.io.PrintWriter(f)
    w.println("id,name,amount")
    w.println("1,alpha,10.5")      // good
    w.println("2,beta,not_a_num")  // type failure -> quarantine
    w.println("3,gamma,7.25")      // good
    w.println("4,delta,1.0,EXTRA") // too many columns -> quarantine
    w.println("5,epsilon")         // short row -> quarantine (count drift)
    w.close()
    try {
      val (good, bad) = RobustCsv.readWithQuarantine(spark, f.getAbsolutePath, schema)
      val goodRows = good.collect().map(r =>
        (r.getLong(0), r.getString(1), Option(r.get(2)).map(_.asInstanceOf[Double])))
      assert(goodRows.toSet === Set(
        (1L, "alpha", Some(10.5)), (3L, "gamma", Some(7.25))))
      // quarantine carries the raw lines, verbatim — including column-count
      // drift in BOTH directions
      val badLines = bad.collect().map(_.getString(0)).toSet
      assert(badLines === Set("2,beta,not_a_num", "4,delta,1.0,EXTRA", "5,epsilon"))
      // the two partitions tile the data rows exactly
      assert(good.count() + bad.count() === 5)
      // good output is fully typed (not strings)
      assert(good.schema.fields.map(_.dataType).toSeq ===
        Seq(LongType, StringType, DoubleType))
    } finally {
      f.delete(); dir.delete()
    }
  }

  test("a clean file quarantines nothing; a hopeless file quarantines everything") {
    val dir = Files.createTempDirectory("graft_csv2").toFile
    val clean = new java.io.File(dir, "clean.csv")
    val pw = new java.io.PrintWriter(clean)
    pw.println("id,name,amount"); pw.println("7,ok,1.0"); pw.close()
    val hopeless = new java.io.File(dir, "bad.csv")
    val pw2 = new java.io.PrintWriter(hopeless)
    pw2.println("id,name,amount"); pw2.println("x,y,z,w,v"); pw2.close()
    try {
      val (g1, b1) = RobustCsv.readWithQuarantine(spark, clean.getAbsolutePath, schema)
      assert(g1.count() === 1 && b1.count() === 0)
      val (g2, b2) = RobustCsv.readWithQuarantine(spark, hopeless.getAbsolutePath, schema)
      assert(g2.count() === 0 && b2.count() === 1)
    } finally {
      clean.delete(); hopeless.delete(); dir.delete()
    }
  }
}
