package graft.pipeline

/** Minimal YAML-subset parser — exactly the grammar the reference's domain
  * configs use (`/root/reference/config/sales_config.yaml`): nested maps by
  * 2-space-ish indentation, lists of scalars, lists of inline maps
  * (`- name: x` + aligned continuation keys), quoted/unquoted scalars, and
  * `#` comments. No anchors, no multi-line scalars, no flow collections —
  * a config loader, not a YAML engine. Zero dependencies by construction
  * (the build has no YAML library on the classpath, deliberately).
  */
object Yaml {

  sealed trait Node
  final case class YStr(value: String) extends Node
  final case class YSeq(items: Vector[Node]) extends Node
  final case class YMap(fields: Vector[(String, Node)]) extends Node {
    def get(key: String): Option[Node] = fields.collectFirst { case (`key`, n) => n }
    def str(key: String): Option[String] = get(key).collect { case YStr(v) => v }
    def int(key: String): Option[Int] = str(key).map(_.toInt)
    def seq(key: String): Vector[Node] =
      get(key).collect { case YSeq(items) => items }.getOrElse(Vector.empty)
    def map(key: String): Option[YMap] = get(key).collect { case m: YMap => m }
    def keys: Seq[String] = fields.map(_._1)
  }

  private final case class Line(indent: Int, text: String)

  def parse(text: String): YMap = {
    val lines = text.linesIterator
      .map(stripComment)
      .filter(_.trim.nonEmpty)
      .map { l =>
        val indent = l.indexWhere(_ != ' ')
        Line(indent, l.trim)
      }
      .toArray
    if (lines.isEmpty) YMap(Vector.empty)
    else {
      val (node, next) = parseBlock(lines, 0, lines(0).indent)
      require(next == lines.length,
        s"yaml: trailing content from line offset $next (mixed indentation?)")
      node match {
        case m: YMap => m
        case other => throw new IllegalArgumentException(s"yaml: top level must be a map, got $other")
      }
    }
  }

  /** Drop a trailing comment: `#` at line start or preceded by whitespace,
    * outside single/double quotes (`source_table: "generated" # comment`).
    * A quote OPENS a region only at a value boundary (line start or after
    * whitespace/`:`/`,`/`[`/`-`) — an apostrophe inside an unquoted scalar
    * (`owner: o'brien # x`) is plain text, not a quote. */
  private def stripComment(line: String): String = {
    def opensAt(i: Int): Boolean =
      i == 0 || " \t:,[-".indexOf(line.charAt(i - 1)) >= 0
    var inS = false; var inD = false
    var i = 0
    while (i < line.length) {
      line.charAt(i) match {
        case '\'' if !inD => if (inS) inS = false else if (opensAt(i)) inS = true
        case '"' if !inS => if (inD) inD = false else if (opensAt(i)) inD = true
        case '#' if !inS && !inD && (i == 0 || line.charAt(i - 1).isWhitespace) =>
          return line.substring(0, i)
        case _ =>
      }
      i += 1
    }
    line
  }

  private def unquote(s: String): String = {
    val t = s.trim
    if (t.length >= 2 &&
        ((t.head == '"' && t.last == '"') || (t.head == '\'' && t.last == '\'')))
      t.substring(1, t.length - 1)
    else t
  }

  private def parseBlock(lines: Array[Line], start: Int, indent: Int): (Node, Int) =
    if (lines(start).text == "-" || lines(start).text.startsWith("- "))
      parseList(lines, start, indent)
    else parseMap(lines, start, indent)

  private def parseMap(lines: Array[Line], start: Int, indent: Int): (YMap, Int) = {
    var fields = Vector.empty[(String, Node)]
    var i = start
    while (i < lines.length && lines(i).indent == indent && !lines(i).text.startsWith("-")) {
      val Line(_, text) = lines(i)
      val colon = text.indexOf(':')
      require(colon > 0, s"yaml: expected 'key: value' or 'key:', got '$text'")
      val key = unquote(text.substring(0, colon))
      require(!fields.exists(_._1 == key),
        s"yaml: duplicate key '$key' (duplicate siblings are a config error)")
      val rest = text.substring(colon + 1).trim
      if (rest.nonEmpty) {
        fields :+= key -> YStr(unquote(rest))
        i += 1
      } else if (i + 1 < lines.length && lines(i + 1).indent > indent) {
        val (node, next) = parseBlock(lines, i + 1, lines(i + 1).indent)
        fields :+= key -> node
        i = next
      } else {
        fields :+= key -> YStr("") // `key:` with nothing nested
        i += 1
      }
    }
    (YMap(fields), i)
  }

  private def parseList(lines: Array[Line], start: Int, indent: Int): (YSeq, Int) = {
    var items = Vector.empty[Node]
    var i = start
    while (i < lines.length && lines(i).indent == indent &&
           (lines(i).text == "-" || lines(i).text.startsWith("- "))) {
      val rest = lines(i).text.drop(1).trim
      if (rest.isEmpty) {
        // `-` alone: item is the nested block below
        require(i + 1 < lines.length && lines(i + 1).indent > indent,
          "yaml: bare '-' with no nested block")
        val (node, next) = parseBlock(lines, i + 1, lines(i + 1).indent)
        items :+= node
        i = next
      } else if (!rest.startsWith("\"") && !rest.startsWith("'") &&
                 rest.takeWhile(c => c != ':').nonEmpty && rest.contains(':') &&
                 (rest.endsWith(":") || rest.contains(": "))) {
        // (a QUOTED item is always a scalar, even if it contains ': ')
        // `- key: value` inline map item; continuation keys sit at the
        // column where `key` starts (dash column + 2). Splice the rewritten
        // first line in place and parse a map from there.
        val itemIndent = indent + (lines(i).text.length - rest.length)
        val patched = lines.clone()
        patched(i) = Line(itemIndent, rest)
        val (node, next) = parseMap(patched, i, itemIndent)
        items :+= node
        i = next
      } else {
        items :+= YStr(unquote(rest))
        i += 1
      }
    }
    (YSeq(items), i)
  }
}
