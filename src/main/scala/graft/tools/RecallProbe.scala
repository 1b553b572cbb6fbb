package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.similarity.Ann
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val e = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val q = e.filter(col("vec_id") < 10)
    val brute = Ann.bruteForceTopK(e, "vec_id", "embedding", q, "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    def rec(s: Set[(Long, Long)]) = (brute & s).size.toDouble / brute.size
    for ((t, p) <- Seq((32, 4), (48, 4), (32, 3), (64, 4))) {
      val lsh = Ann.lshTopK(e, "vec_id", "embedding", q, "vec_id", "embedding", 10, tables = t, planes = p)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      println(s"LSH t=$t p=$p recall: ${rec(lsh)}")
    }
    for ((nl, np) <- Seq((16, 8), (16, 10), (32, 16), (8, 5))) {
      val ivf = Ann.ivfTopK(e, "vec_id", "embedding", q, "vec_id", "embedding", 10, nlist = nl, nprobe = np)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      println(s"IVF nl=$nl np=$np recall: ${rec(ivf)}")
    }
    for ((m, ks, of) <- Seq((8, 16, 16), (8, 32, 16), (16, 16, 16), (8, 16, 40))) {
      val pq = Ann.pqTopK(e, "vec_id", "embedding", q, "vec_id", "embedding", 10, m = m, ks = ks, overfetch = of)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      println(s"PQ m=$m ks=$ks of=$of recall: ${rec(pq)}")
    }
    spark.stop()
  }
}
