package graft.pipeline

/** Minimal YAML-subset parser for reference-shaped pipeline configs
  * (reference examples/configs/example.yaml): nested maps, block lists
  * (`- item`), scalars with optional single/double quotes, `#` comments
  * and blank lines. Deliberately NOT a full YAML implementation (no
  * flow style, anchors, multi-line strings, multi-document) — the
  * offline build has no YAML dependency, and pipeline configs only use
  * this subset.
  *
  * Produces the same generic shape Jackson gives ConfigJson: Scala
  * `Map[String, Any]` / `List[Any]` / `String` / `Long` / `Double` /
  * `Boolean` / `null`.
  */
object MiniYaml {

  def parse(text: String): Any = {
    val lines = text.linesIterator.toVector
      .map(stripComment)
      .filter(_.trim.nonEmpty)
      .map(l => (indentOf(l), l.trim))
    if (lines.isEmpty) Map.empty[String, Any]
    else {
      val (v, next) = parseBlock(lines, 0, lines.head._1)
      require(next == lines.length,
        s"yaml: trailing content at '${lines.lift(next).map(_._2).getOrElse("")}'" +
          " (inconsistent indentation?)")
      v
    }
  }

  /** Strip an unquoted `#` comment (YAML requires whitespace before an
    * inline `#`, which keeps anchors-in-urls intact).
    */
  private def stripComment(line: String): String = {
    var inS = false; var inD = false
    var i = 0
    while (i < line.length) {
      line.charAt(i) match {
        case '\'' if !inD => inS = !inS
        case '"' if !inS => inD = !inD
        case '#' if !inS && !inD && (i == 0 || line.charAt(i - 1).isWhitespace) =>
          return line.substring(0, i)
        case _ =>
      }
      i += 1
    }
    line
  }

  private def indentOf(l: String): Int = l.takeWhile(_ == ' ').length

  private def isListItem(s: String): Boolean = s == "-" || s.startsWith("- ")

  /** First unquoted `": "` (or trailing `:`) splits key from value. */
  private def splitEntry(s: String): Option[(String, String)] = {
    var inS = false; var inD = false
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' if !inD => inS = !inS
        case '"' if !inS => inD = !inD
        case ':' if !inS && !inD && (i == s.length - 1 || s.charAt(i + 1) == ' ') =>
          return Some((unquote(s.substring(0, i).trim), s.substring(i + 1).trim))
        case _ =>
      }
      i += 1
    }
    None
  }

  private def unquote(s: String): String =
    if (s.length >= 2 &&
      ((s.head == '\'' && s.last == '\'') || (s.head == '"' && s.last == '"')))
      s.substring(1, s.length - 1)
    else s

  private def scalar(s: String): Any = {
    val raw = s.trim
    if (raw.length >= 2 && (raw.head == '\'' || raw.head == '"')) unquote(raw)
    else raw match {
      case "null" | "~" => null
      case "true" | "True" => java.lang.Boolean.TRUE
      case "false" | "False" => java.lang.Boolean.FALSE
      case _ =>
        raw.toLongOption.map(Long.box)
          .orElse(raw.toDoubleOption.map(Double.box))
          .getOrElse(raw)
    }
  }

  private def parseBlock(lines: Vector[(Int, String)], i: Int, ind: Int): (Any, Int) =
    if (isListItem(lines(i)._2)) parseList(lines, i, ind)
    else parseMap(lines, i, ind)

  private def parseList(lines: Vector[(Int, String)], i0: Int, ind: Int): (List[Any], Int) = {
    val items = scala.collection.mutable.ListBuffer[Any]()
    var i = i0
    while (i < lines.length && lines(i)._1 == ind && isListItem(lines(i)._2)) {
      val rest = lines(i)._2.drop(1).trim
      if (rest.isEmpty) {
        require(i + 1 < lines.length && lines(i + 1)._1 > ind,
          s"yaml: empty list item with no nested block (item ${items.length})")
        val (v, n) = parseBlock(lines, i + 1, lines(i + 1)._1)
        items += v; i = n
      } else if (splitEntry(rest).isDefined) {
        // map item: re-parse the inline first entry at indent+2 with the
        // item's continuation lines
        val virtual = (ind + 2, rest) +: lines.drop(i + 1)
        val (v, consumed) = parseMap(virtual, 0, ind + 2)
        items += v; i = i + consumed
      } else {
        items += scalar(rest); i += 1
      }
    }
    (items.toList, i)
  }

  private def parseMap(lines: Vector[(Int, String)], i0: Int, ind: Int): (Map[String, Any], Int) = {
    var m = scala.collection.immutable.ListMap[String, Any]()
    var i = i0
    while (i < lines.length && lines(i)._1 == ind && !isListItem(lines(i)._2)
      && splitEntry(lines(i)._2).isDefined) {
      val Some((k, v)) = splitEntry(lines(i)._2)
      if (v.nonEmpty) { m += (k -> scalar(v)); i += 1 }
      else if (i + 1 < lines.length && lines(i + 1)._1 > ind) {
        val (nested, n) = parseBlock(lines, i + 1, lines(i + 1)._1)
        m += (k -> nested); i = n
      } else { m += (k -> null); i += 1 }
    }
    require(i > i0, s"yaml: expected map entry at '${lines(i0)._2}'")
    (m, i)
  }
}
