package graft.tools
object PrintOracle {
  def main(args: Array[String]): Unit =
    args.foreach(n => println("ORACLE_BEGIN " + n + "\n" + graft.SparkEntry.oracleSql(n) + "\nORACLE_END"))
}
