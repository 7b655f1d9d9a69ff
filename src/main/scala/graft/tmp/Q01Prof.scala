import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Q01Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def t(name: String)(f: => Unit): Unit = {
      for (r <- 1 to 3) { val t0 = System.nanoTime(); f
        println(f"[prof] $name rep$r: ${(System.nanoTime()-t0)/1e9}%.2f s") }
    }
    spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    val li = graft.Tables.lineitem(spark, d)
    li.groupBy("l_returnflag").count().write.format("noop").mode("overwrite").save()
    def dsum(c: org.apache.spark.sql.Column) = sum(c.cast("decimal(18,4)")).cast("double")
    t("decimal 5-sum") {
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(dsum(col("l_quantity")).as("a"), dsum(col("l_extendedprice")).as("b"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("c"),
          (dsum(col("l_quantity"))/count(lit(1))).as("d"),
          (dsum(col("l_discount"))/count(lit(1))).as("e"),
          count(lit(1)).as("n"))
        .write.format("noop").mode("overwrite").save()
    }
    t("double 5-sum") {
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("a"), sum(col("l_extendedprice")).as("b"),
          sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("c"),
          (sum(col("l_quantity"))/count(lit(1))).as("d"),
          (sum(col("l_discount"))/count(lit(1))).as("e"),
          count(lit(1)).as("n"))
        .write.format("noop").mode("overwrite").save()
    }
    t("long-scaled 5-sum") {
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(round(col("l_quantity")*10000).cast("long")).as("a"),
          sum(round(col("l_extendedprice")*10000).cast("long")).as("b"),
          sum(round((col("l_extendedprice") * (lit(1.0) - col("l_discount")))*10000).cast("long")).as("c"),
          sum(round(col("l_discount")*10000).cast("long")).as("e"),
          count(lit(1)).as("n"))
        .write.format("noop").mode("overwrite").save()
    }
    t("scan only") {
      li.select(col("l_returnflag"), col("l_linestatus"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
