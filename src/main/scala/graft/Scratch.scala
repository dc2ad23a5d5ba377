package graft
// throwaway microbenchmark — NOT committed; deleted before round end
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.model.Tables
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val sampled = docs.repartition(32, col("doc_id")).persist()
    println("docs=" + sampled.count())
    def time(tag: String)(f: => Long): Unit = {
      f // warm
      val t0 = System.nanoTime(); val n = f
      println(f"$tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s   rows=$n")
    }
    val toks = sampled.select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
    time("explode only")(toks.count())
    time("explode+md5conv") {
      sampled.select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
        .select(col("doc_id"), graft.ext.TextOps.portableHash(col("t")).as("h"))
        .groupBy(col("doc_id")).agg(sum(col("h")).as("s")).count()
    }
    time("explode+xxhash") {
      sampled.select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
        .select(col("doc_id"), xxhash64(col("t")).as("h"))
        .groupBy(col("doc_id")).agg(sum(col("h")).as("s")).count()
    }
    val bitAggs60 = (0 until 60).map { j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L)).as(s"s$j")
    }
    time("md5conv + 60 when-sums") {
      sampled.select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
        .select(col("doc_id"), graft.ext.TextOps.portableHash(col("t")).as("h"))
        .groupBy(col("doc_id")).agg(bitAggs60.head, bitAggs60.tail: _*).count()
    }
    val bitAggsPlain = (0 until 60).map { j =>
      sum(shiftright(col("h"), j).bitwiseAND(lit(1L))).as(s"c$j")
    }
    time("md5conv + 60 bit-sums") {
      sampled.select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
        .select(col("doc_id"), graft.ext.TextOps.portableHash(col("t")).as("h"))
        .groupBy(col("doc_id")).agg(bitAggsPlain.head, bitAggsPlain.tail: _*).count()
    }
    time("xxh + 60 when-sums") {
      sampled.select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
        .select(col("doc_id"), xxhash64(col("t")).as("h"))
        .groupBy(col("doc_id")).agg(bitAggs60.head, bitAggs60.tail: _*).count()
    }
    spark.stop()
  }
}
