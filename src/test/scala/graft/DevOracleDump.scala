package graft

/** Dev scratch (r11 #1): dump SparkEntry.oracleSql to dev/oracle_sql.json
  * so dialect-rewrite drafting can be scripted. */
object DevOracleDump {
  def main(args: Array[String]): Unit = {
    val sb = new StringBuilder("{\n")
    val keys = SparkEntry.oracleSql.keys.toSeq.sorted
    def esc(s: String) = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\t' => "\\t"
      case '\r' => ""
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    keys.zipWithIndex.foreach { case (k, i) =>
      sb.append(s"""  "${esc(k)}": "${esc(SparkEntry.oracleSql(k))}"""")
      sb.append(if (i == keys.size - 1) "\n" else ",\n")
    }
    sb.append("}\n")
    java.nio.file.Files.write(java.nio.file.Paths.get("dev/oracle_sql.json"),
      sb.toString.getBytes("UTF-8"))
    println(s"dumped ${keys.size} oracle texts -> dev/oracle_sql.json")
  }
}
