package graft.pipeline

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pure-JVM linear-chain CRF inference (D1/D2 backend; reference drives
  * the equivalent through a wapiti subprocess,
  * `models/wapiti_model_impl.py:25-164`, over GROBID-style feature data
  * lines, `models/data.py:46-55`).
  *
  * Model = text file with wapiti-style observation patterns and learned
  * weights; decoding = standard first-order Viterbi:
  *
  * {{{
  * [labels]
  * O
  * B-<title>
  * I-<title>
  * [patterns]
  * U00:%x[0,0]            # unigram pattern: this row, column 0
  * U01:%x[-1,0]           # previous row, column 0
  * U02:%x[0,1]/%x[0,3]    # conjunction of two columns
  * B                      # observation-independent transition bigram
  * [weights]
  * U00:Title<TAB>B-<title><TAB>2.0
  * B:<TAB>B-<title><TAB>I-<title><TAB>1.0
  * }}}
  *
  * `%x[row,col]` is the wapiti/CRF++ template addressing: the value of
  * column `col` of the data line at relative row offset `row` within the
  * current sequence (out-of-range rows expand to `_X[row,col]`, wapiti's
  * special-token behavior). An observation string is the pattern id plus
  * its expanded values; emission score of label y at row t is the sum of
  * the matched observation weights; transition scores come from the `B`
  * pattern. `score(y⃗) = Σ_t emit(t, y_t) + Σ_t trans(y_{t-1}, y_t)`,
  * decoded exactly by Viterbi — identical inference semantics to wapiti
  * with precomputed feature columns (which is how the reference calls
  * it: features are generated in Python, wapiti only labels).
  *
  * Spark shape: the parsed model is broadcast once; labeling is
  * `mapPartitions` over sequence-contiguous sorted rows —
  * embarrassingly parallel by sequence, no shuffle beyond the one
  * `repartition` on the scope key. `perPage` opts into
  * `(doc_id, page_idx)` sequences ([[SequenceScope]]) — the
  * giant-document skew mitigation for the segmentation pass.
  */
final class CrfLabeler(
    modelText: String,
    featuresCol: String = "features",
    perPage: Boolean = false) extends SequenceLabeler {

  override def label(tokens: DataFrame): DataFrame = {
    val spark = tokens.sparkSession
    import spark.implicits._
    val model = CrfModel.parse(modelText)
    val bc = spark.sparkContext.broadcast(model)
    val fCol = featuresCol
    val byPage = perPage
    val labeled = SequenceScope.contiguous(tokens, fCol, byPage)
      .as[SequenceScope.In]
      .mapPartitions { it =>
        val m = bc.value
        SequenceScope.sequences(it, byPage).flatMap { rows =>
          val labels = m.decode(rows.map(_._8))
          rows.iterator.zip(labels.iterator).map { case (r, lab) =>
            (r._1, r._2, r._3, r._4, r._5, r._6, r._7, r._8, lab)
          }
        }
      }
    labeled.toDF("doc_id", "page_idx", "block_idx", "line_idx", "token_idx",
      "text", "whitespace", fCol, "label")
  }
}

object CrfLabeler {

  /** Load a labeler from a wapiti model file on disk — plain text or
    * gzipped (the reference ships its trained models as
    * `<model_path>/model.wapiti.gz`, `models/wapiti_model_impl.py:40`;
    * gzip is detected from the magic bytes, not the extension). The
    * parsed model is what gets broadcast — load once on the driver.
    */
  def fromFile(path: String, featuresCol: String = "features"): CrfLabeler = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val text =
      if (bytes.length >= 2 && (bytes(0) & 0xFF) == 0x1f && (bytes(1) & 0xFF) == 0x8b) {
        val in = new java.util.zip.GZIPInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
        finally in.close()
      } else new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    new CrfLabeler(text, featuresCol)
  }
}

/** Parsed CRF model: labels, observation patterns, weight tables.
  * `bigramObs` carries observation-dependent transition weights
  * (flattened [prev × next] per observation) for native-wapiti models
  * whose bigram templates reference data columns; the constant `b`
  * template folds into the static `transition` matrix instead.
  */
final case class CrfModel(
    labels: IndexedSeq[String],
    patterns: IndexedSeq[CrfModel.Pattern],
    // observation string -> per-label emission weights
    unigram: Map[String, Array[Double]],
    // transition weights [prev][next]
    transition: Array[Array[Double]],
    // observation string -> flattened [prev*nLabels + next] weights
    bigramObs: Map[String, Array[Double]] = Map.empty) extends Serializable {

  /** Viterbi decode one sequence of data lines (whitespace-split into
    * observation columns). Returns one label per line.
    */
  def decode(dataLines: Seq[String]): Seq[String] = {
    val n = dataLines.size
    if (n == 0) return Nil
    val nl = labels.size
    val cols: IndexedSeq[Array[String]] =
      dataLines.iterator.map(_.split("\\s+")).toIndexedSeq

    def cell(t: Int, row: Int, c: Int): String = {
      val r = t + row
      if (r < 0 || r >= n) s"_X[$row,$c]"
      else { val line = cols(r); if (c < line.length) line(c) else s"_X[$row,$c]" }
    }

    // emission scores: sum of matched unigram observation weights;
    // bigAdd(t) accumulates observation-dependent transition weights
    // applying to the (t-1 -> t) transition
    val emit = Array.ofDim[Double](n, nl)
    var bigAdd: Array[Array[Double]] = null
    var t = 0
    while (t < n) {
      patterns.foreach {
        case CrfModel.Unigram(id, cells) =>
          val obs = id + ":" + cells.map { case (r, c) => cell(t, r, c) }.mkString("|")
          unigram.get(obs) match {
            case Some(w) =>
              var y = 0
              while (y < nl) { emit(t)(y) += w(y); y += 1 }
            case None => ()
          }
        case CrfModel.Bigram => ()
        case tm: CrfModel.Template =>
          val obs = CrfModel.expandTemplate(tm, cols, t)
          if ((tm.kind & 1) != 0) unigram.get(obs).foreach { w =>
            var y = 0
            while (y < nl) { emit(t)(y) += w(y); y += 1 }
          }
          if ((tm.kind & 2) != 0 && t > 0) bigramObs.get(obs).foreach { w =>
            if (bigAdd == null) bigAdd = new Array[Array[Double]](n)
            if (bigAdd(t) == null) bigAdd(t) = new Array[Double](nl * nl)
            var i = 0
            while (i < w.length) { bigAdd(t)(i) += w(i); i += 1 }
          }
      }
      t += 1
    }

    // Viterbi
    val delta = Array.ofDim[Double](n, nl)
    val back = Array.ofDim[Int](n, nl)
    var y = 0
    while (y < nl) { delta(0)(y) = emit(0)(y); y += 1 }
    t = 1
    while (t < n) {
      val bt = if (bigAdd == null) null else bigAdd(t)
      y = 0
      while (y < nl) {
        var best = Double.NegativeInfinity
        var bestP = 0
        var p = 0
        while (p < nl) {
          var s = delta(t - 1)(p) + transition(p)(y)
          if (bt != null) s += bt(p * nl + y)
          if (s > best) { best = s; bestP = p }
          p += 1
        }
        delta(t)(y) = best + emit(t)(y)
        back(t)(y) = bestP
        y += 1
      }
      t += 1
    }
    var bestY = 0
    y = 1
    while (y < nl) { if (delta(n - 1)(y) > delta(n - 1)(bestY)) bestY = y; y += 1 }
    val out = new Array[String](n)
    t = n - 1
    while (t >= 0) {
      out(t) = labels(bestY)
      if (t > 0) bestY = back(t)(bestY)
      t -= 1
    }
    out.toIndexedSeq
  }
}

object CrfModel {

  sealed trait Pattern extends Serializable
  /** `U<id>:%x[r,c](/%x[r,c])*` — conjunction of data-line cells. */
  final case class Unigram(id: String, cells: Seq[(Int, Int)]) extends Pattern
  /** `B` — observation-independent transition features. */
  case object Bigram extends Pattern

  /** Wapiti/CRF++ template compiled for literal expansion: static text
    * chunks copied verbatim, `%x[r,c]` cells substituted (`%X` →
    * lowercased value), out-of-range rows expanding to wapiti's
    * `_x-1`/`_x+1`. `kind` = 1 unigram / 2 bigram / 3 both, from the
    * template's first character (`u`/`b`/`*`, case-insensitive) —
    * wapiti `model.c` lays feature ids out in exactly this order.
    */
  sealed trait Chunk extends Serializable
  final case class Lit(s: String) extends Chunk
  final case class Cell(row: Int, col: Int, lower: Boolean) extends Chunk
  final case class Template(src: String, chunks: Seq[Chunk], kind: Int)
    extends Pattern

  private val CellRe = """%x\[(-?\d+),(\d+)\]""".r
  private val TmplCellRe = """%[xX]\[(-?\d+),(\d+)\]""".r

  /** Expand a compiled template at position `t` of a sequence whose
    * data lines are `cols` — wapiti's literal expansion with its
    * out-of-range substitution (`pattern.c`): `_x-1` before the
    * sequence, `_x+1` after it, empty string for a missing column.
    * Shared by [[CrfModel.decode]] and [[CrfTrainer]] so the features
    * a model was trained on are BY CONSTRUCTION the features inference
    * scores. */
  private[pipeline] def expandTemplate(tm: Template,
      cols: IndexedSeq[Array[String]], t: Int): String = {
    val n = cols.length
    val sb = new StringBuilder
    tm.chunks.foreach {
      case Lit(s) => sb ++= s
      case Cell(row, c, lower) =>
        val r = t + row
        val v =
          if (r < 0) "_x-1"
          else if (r >= n) "_x+1"
          else { val line = cols(r); if (c < line.length) line(c) else "" }
        sb ++= (if (lower) v.toLowerCase else v)
    }
    sb.toString
  }

  /** Compile one wapiti template source line into [[Template]]. Only
    * `%x`/`%X` items are supported (the GROBID model family uses
    * nothing else); `%t`/`%m` regex items are rejected loudly.
    */
  private[pipeline] def compileTemplate(src: String): Template = {
    require(src.nonEmpty, "empty pattern line")
    val kind = src.charAt(0).toLower match {
      case 'u' => 1
      case 'b' => 2
      case '*' => 3
      case c => throw new IllegalArgumentException(
        s"unsupported pattern kind '$c' in: $src")
    }
    require(!src.matches(".*%[tTmM]\\[.*"),
      s"unsupported %t/%m regex item in pattern: $src")
    val chunks = scala.collection.mutable.ListBuffer.empty[Chunk]
    var last = 0
    val m = TmplCellRe.pattern.matcher(src)
    while (m.find()) {
      if (m.start() > last) chunks += Lit(src.substring(last, m.start()))
      val lower = src.charAt(m.start() + 1) == 'X'
      chunks += Cell(m.group(1).toInt, m.group(2).toInt, lower)
      last = m.end()
    }
    if (last < src.length) chunks += Lit(src.substring(last))
    Template(src, chunks.toList, kind)
  }

  /** Parse either model format: wapiti's native text dump
    * (`#mdl#…` header, [[parseWapitiNative]]) or the simple
    * `[labels]/[patterns]/[weights]` format (see [[CrfLabeler]]
    * scaladoc).
    */
  def parse(text: String): CrfModel =
    if (text.startsWith("#mdl#")) parseWapitiNative(text) else parseSimple(text)

  /** Loader for wapiti's native model file format (the text file
    * `wapiti train` saves and `wapiti label -m` loads; reference
    * models ship this format gzipped as `model.wapiti.gz`,
    * `models/wapiti_model_impl.py:40`). Layout, per wapiti `model.c`
    * `mdl_save` / `reader.c` `rdr_save` / `quark.c` `qrk_save`:
    *
    * {{{
    * #mdl#<type>#<nactive>          model header
    * #rdr#<npats>/<ntoks>[/<autouni>]
    * #pat#<npats>                   template source lines follow
    * u:%x[0,0]                      (× npats)
    * #qrk#<nlbl>                    label strings follow (× nlbl)
    * #qrk#<nobs>                    observation strings follow (× nobs)
    * <featureId>=<weight>           sparse weights, C "%la" hex floats
    * }}}
    *
    * Feature ids are assigned by scanning observations in quark order:
    * an observation whose first char is `u`/`U` takes `nlbl` unigram
    * slots, `b`/`B` takes `nlbl²` transition slots ([prev × next]),
    * `*` takes both (unigram block first) — decode scores then follow
    * standard linear-chain CRF semantics. Bigram observations with no
    * `%x` cells (the plain `b` template) expand identically at every
    * position and are folded into the static transition matrix.
    */
  def parseWapitiNative(text: String): CrfModel = {
    val lines = text.linesIterator.toIndexedSeq
    var i = 0
    def expect(prefix: String): String = {
      require(i < lines.length && lines(i).startsWith(prefix),
        s"expected $prefix at line $i: ${lines.lift(i).getOrElse("<eof>")}")
      val l = lines(i); i += 1; l
    }
    expect("#mdl#")
    val rdr = expect("#rdr#").stripPrefix("#rdr#").split('/')
    require(rdr.length >= 2, "bad #rdr# line")
    val npats = rdr(0).trim.toInt
    val patHeader = expect("#pat#")
    require(patHeader.stripPrefix("#pat#").trim.toInt == npats, "pattern count mismatch")
    val templates = (0 until npats).map { _ =>
      val l = lines(i); i += 1; compileTemplate(l.trim)
    }
    val nlbl = expect("#qrk#").stripPrefix("#qrk#").trim.toInt
    val labels = (0 until nlbl).map { _ => val l = lines(i); i += 1; l }
    val nobs = expect("#qrk#").stripPrefix("#qrk#").trim.toInt
    val obsList = (0 until nobs).map { _ => val l = lines(i); i += 1; l }

    // feature-id layout per observation
    val Y = nlbl
    var nextOff = 0L
    val uoff = new Array[Long](nobs)
    val boff = new Array[Long](nobs)
    java.util.Arrays.fill(uoff, -1L)
    java.util.Arrays.fill(boff, -1L)
    obsList.zipWithIndex.foreach { case (obs, o) =>
      require(obs.nonEmpty, s"empty observation at index $o")
      val kind = obs.charAt(0).toLower match {
        case 'u' => 1
        case 'b' => 2
        case '*' => 3
        case c => throw new IllegalArgumentException(
          s"unsupported observation kind '$c': $obs")
      }
      if ((kind & 1) != 0) { uoff(o) = nextOff; nextOff += Y }
      if ((kind & 2) != 0) { boff(o) = nextOff; nextOff += Y.toLong * Y }
    }

    // sparse weights — errors name the 1-based model line so a corrupt
    // dump is diagnosable (a bare NumberFormatException from a 40k-line
    // weight section is not)
    val theta = scala.collection.mutable.LongMap.empty[Double]
    while (i < lines.length) {
      val l = lines(i).trim
      i += 1
      if (l.nonEmpty) {
        val eq = l.indexOf('=')
        require(eq > 0, s"bad weight line $i: '$l' (expected <featureId>=<weight>)")
        try theta(l.substring(0, eq).toLong) = parseCDouble(l.substring(eq + 1))
        catch {
          case e: NumberFormatException => throw new IllegalArgumentException(
            s"bad weight line $i: '$l' (${e.getMessage})", e)
        }
      }
    }

    // materialize per-observation weight tables
    val uni = Map.newBuilder[String, Array[Double]]
    val big = Map.newBuilder[String, Array[Double]]
    val staticTrans = Array.ofDim[Double](Y, Y)
    obsList.zipWithIndex.foreach { case (obs, o) =>
      if (uoff(o) >= 0) {
        val w = new Array[Double](Y)
        var y = 0
        var any = false
        while (y < Y) {
          val v = theta.getOrElse(uoff(o) + y, 0.0)
          if (v != 0.0) any = true
          w(y) = v
          y += 1
        }
        if (any) uni += obs -> w
      }
      if (boff(o) >= 0) {
        val w = new Array[Double](Y * Y)
        var k = 0
        var any = false
        while (k < Y * Y) {
          val v = theta.getOrElse(boff(o) + k, 0.0)
          if (v != 0.0) any = true
          w(k) = v
          k += 1
        }
        if (any) {
          // constant bigram template (no %x cells) -> static transitions
          val tmpl = templates.find(t => (t.kind & 2) != 0 &&
            t.chunks.forall(_.isInstanceOf[Lit]) &&
            t.chunks.collect { case Lit(s) => s }.mkString == obs)
          if (tmpl.isDefined) {
            var p = 0
            while (p < Y) {
              var y = 0
              while (y < Y) { staticTrans(p)(y) += w(p * Y + y); y += 1 }
              p += 1
            }
          } else big += obs -> w
        }
      }
    }
    CrfModel(labels, templates.toIndexedSeq, uni.result(), staticTrans,
      big.result())
  }

  /** C `%la` hex-float (e.g. `0x1.5bf0ap+1`) or plain decimal. */
  private def parseCDouble(s: String): Double = java.lang.Double.parseDouble(s.trim)

  /** Serialize a model to wapiti's NATIVE text dump — the exact layout
    * [[parseWapitiNative]] reads (and `wapiti label -m` loads), with
    * weights as lossless hex floats. Requires template-kind patterns
    * (the [[CrfTrainer]] output); static transitions are emitted under
    * the constant bigram template's expansion, mirroring the fold the
    * parser applies on load, so save → parse round-trips to an
    * equivalent model. Observation order is sorted (deterministic
    * output for a given model). */
  def toWapitiNative(m: CrfModel): String = {
    val templates = m.patterns.map {
      case t: Template => t
      case p => throw new IllegalArgumentException(
        s"toWapitiNative needs template patterns, got: $p")
    }
    val Y = m.labels.size
    val transNonZero = m.transition.exists(_.exists(_ != 0.0))
    val constObs = templates
      .filter(t => (t.kind & 2) != 0 && t.chunks.forall(_.isInstanceOf[Lit]))
      .map(_.chunks.collect { case Lit(s) => s }.mkString)
      .headOption
    require(!transNonZero || constObs.isDefined,
      "static transition weights need a constant bigram template (`b`)")
    val obsList = (m.unigram.keySet ++ m.bigramObs.keySet ++
      (if (transNonZero) constObs.toSet else Set.empty[String]))
      .toSeq.sorted
    // feature-id layout: the same scan parseWapitiNative performs
    var nextOff = 0L
    val weights = mutable.ArrayBuffer.empty[(Long, Double)]
    obsList.foreach { obs =>
      val kind = obs.charAt(0).toLower match {
        case 'u' => 1
        case 'b' => 2
        case '*' => 3
        case c => throw new IllegalArgumentException(
          s"observation must start with u/b/* (got '$c'): $obs")
      }
      if ((kind & 1) != 0) {
        m.unigram.get(obs).foreach { w =>
          var y = 0
          while (y < Y) {
            if (w(y) != 0.0) weights += ((nextOff + y, w(y)))
            y += 1
          }
        }
        nextOff += Y
      }
      if ((kind & 2) != 0) {
        val w: Option[Array[Double]] =
          if (constObs.contains(obs) && transNonZero)
            Some(m.transition.flatten.toArray)
          else m.bigramObs.get(obs)
        w.foreach { arr =>
          var k = 0
          while (k < Y * Y) {
            if (arr(k) != 0.0) weights += ((nextOff + k, arr(k)))
            k += 1
          }
        }
        nextOff += Y.toLong * Y
      }
    }
    val ntoks = (templates.flatMap(_.chunks).collect {
      case Cell(_, c, _) => c + 1
    } :+ 1).max
    val sb = new StringBuilder
    sb ++= s"#mdl#2#${weights.size}\n"
    sb ++= s"#rdr#${templates.size}/$ntoks\n"
    sb ++= s"#pat#${templates.size}\n"
    templates.foreach(t => sb ++= t.src += '\n')
    sb ++= s"#qrk#${m.labels.size}\n"
    m.labels.foreach(l => sb ++= l += '\n')
    sb ++= s"#qrk#${obsList.size}\n"
    obsList.foreach(o => sb ++= o += '\n')
    weights.foreach { case (id, w) =>
      sb ++= s"$id=${java.lang.Double.toHexString(w)}\n"
    }
    sb.toString
  }

  /** Parse the simple text model format (see [[CrfLabeler]] scaladoc). */
  def parseSimple(text: String): CrfModel = {
    var section = ""
    val labels = mutable.ArrayBuffer.empty[String]
    val patterns = mutable.ArrayBuffer.empty[Pattern]
    val uniRaw = mutable.ArrayBuffer.empty[(String, String, Double)]
    val transRaw = mutable.ArrayBuffer.empty[(String, String, Double)]

    text.linesIterator.foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim match {
        case l if raw.trim.startsWith("#") => ""
        case l => l
      }
      line match {
        case "" => ()
        case s if s.startsWith("[") && s.endsWith("]") =>
          section = s.substring(1, s.length - 1)
        case l => section match {
          case "labels" => labels += l
          case "patterns" =>
            if (l == "B" || l == "b") patterns += Bigram
            else {
              val colonAt = l.indexOf(':')
              require(colonAt > 0, s"bad pattern: $l")
              val id = l.substring(0, colonAt)
              val cells = CellRe.findAllMatchIn(l.substring(colonAt + 1))
                .map(m => (m.group(1).toInt, m.group(2).toInt)).toSeq
              require(cells.nonEmpty, s"pattern without %x cells: $l")
              patterns += Unigram(id, cells)
            }
          case "weights" =>
            val parts = l.split('\t')
            // transitions only under the exact `B`/`B:` id — a unigram
            // pattern id merely beginning with "B" (e.g. `B12:…`) is an
            // observation weight
            if (parts.length == 4 && (parts(0) == "B:" || parts(0) == "B")) {
              transRaw += ((parts(1), parts(2), parts(3).toDouble))
            } else {
              require(parts.length == 3, s"bad weight line: $l")
              uniRaw += ((parts(0), parts(1), parts(2).toDouble))
            }
          case other => throw new IllegalArgumentException(s"line outside section: $l")
        }
      }
    }

    val labelIdx = labels.zipWithIndex.toMap
    val nl = labels.size
    val uni = uniRaw.groupBy(_._1).map { case (obs, ws) =>
      val arr = new Array[Double](nl)
      ws.foreach { case (_, lab, w) =>
        arr(labelIdx.getOrElse(lab,
          throw new IllegalArgumentException(s"unknown label $lab"))) += w
      }
      obs -> arr
    }
    val trans = Array.ofDim[Double](nl, nl)
    transRaw.foreach { case (p, y, w) =>
      trans(labelIdx(p))(labelIdx(y)) += w
    }
    CrfModel(labels.toIndexedSeq, patterns.toIndexedSeq, uni, trans)
  }
}
