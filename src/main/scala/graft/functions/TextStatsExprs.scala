package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the tokenize / quality-stats /
  * window-string hot paths of the curation pipelines (r18 optimization
  * round).
  *
  * The r17 seam ledger attributed the bulk of the composed-chain wall to
  * the corpus-scale projection stages: `regexp_extract_all(text,'\S+')`
  * re-runs the java.util.regex engine per document, and the quality
  * stats / chunk / window strings were interpreted higher-order-function
  * lambdas (one boxed-lambda dispatch per token, with intermediate
  * slices and `array_distinct` scans kept alive). Each of these is
  * really a single tight loop over the token array — so compute it as
  * such, inside whole-stage codegen, exactly like [[TextHashes]] does
  * for the fingerprint path.
  *
  * Semantics contracts (asserted row-for-row in TextStatsSpec):
  *  - [[TextStats.wsTokens]] ==  regexp_extract_all(text, '\S+', 0).
  *    Java's \s is exactly [ \t\n\x0B\f\r]; all six are single ASCII
  *    bytes, and in UTF-8 no multi-byte sequence contains an ASCII
  *    byte, so the byte-level scan splits identically to the regex.
  *  - [[TextStats.qualityStats]] == the d19 stat quadruple
  *    (n_tok, tok_chars, n_stop, n_tri_distinct) of the HOF
  *    formulation, including null-element propagation (a null token
  *    nulls tok_chars, never counts as a stopword, and nulls the
  *    trigrams it touches, which array_distinct counts once).
  *  - [[TextStats.gramJoins]] == the chunksExpr / winsExpr transform +
  *    slice + array_join lambdas (array_join skips null elements).
  */
object TextStats {

  private def isWs(b: Byte): Boolean =
    b == 0x20 || b == 0x09 || b == 0x0a || b == 0x0b || b == 0x0c || b == 0x0d

  /** Maximal non-whitespace runs of `text`, byte-identical to
    * regexp_extract_all(text, '\S+', 0). */
  def wsTokens(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    val out = new java.util.ArrayList[UTF8String]()
    var i = 0
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && !isWs(bytes(i))) i += 1
        out.add(UTF8String.fromBytes(bytes, start, i - start))
      }
    }
    new GenericArrayData(out.toArray)
  }

  /** One-loop d19 stat quadruple over the token array; see class doc. */
  def qualityStats(tokens: ArrayData, stops: Array[UTF8String]): InternalRow = {
    val n = tokens.numElements()
    var tokChars = 0L
    var tokCharsNull = false
    var nStop = 0L
    var i = 0
    val toks = new Array[UTF8String](n)
    while (i < n) {
      val t = if (tokens.isNullAt(i)) null else tokens.getUTF8String(i)
      toks(i) = t
      if (t == null) tokCharsNull = true
      else {
        tokChars += t.numChars()
        var j = 0
        var hit = false
        while (j < stops.length && !hit) {
          if (stops(j).equals(t)) hit = true
          j += 1
        }
        if (hit) nStop += 1
      }
      i += 1
    }
    var nTriDistinct = 0L
    if (n >= 3) {
      val seen = new java.util.HashSet[UTF8String]()
      var sawNullTri = false
      val space = UTF8String.fromString(" ")
      i = 0
      while (i <= n - 3) {
        if (toks(i) == null || toks(i + 1) == null || toks(i + 2) == null)
          sawNullTri = true
        else
          seen.add(UTF8String.concat(toks(i), space, toks(i + 1), space,
            toks(i + 2)))
        i += 1
      }
      nTriDistinct = seen.size.toLong + (if (sawNullTri) 1L else 0L)
    }
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(4)
    row.setLong(0, n.toLong)
    if (tokCharsNull) row.setNullAt(1) else row.setLong(1, tokChars)
    row.setLong(2, nStop)
    row.setLong(3, nTriDistinct)
    row
  }

  /** Space-joined k-token gram strings.
    *  - window mode (stride 1): [] when n < width, else one string per
    *    full window — winsExpr's transform(sequence(1, n-width+1), ...).
    *  - chunk mode (stride == width): ceil(n/width) strings, the last
    *    one partial — chunksExpr's transform over slice(tk, i*w+1, w).
    * array_join semantics: null elements are skipped (no separator).
    * Contract divergence vs the replaced width-2 bigram HOF (r18
    * advice): that HOF used concat, which emits a NULL element per null
    * token, while concatWs skips them — unreachable in the engine
    * because every input rides ws_tokens/bpe_pre_tokens arrays, which
    * are containsNull=false by construction. */
  def gramJoins(tokens: ArrayData, width: Int, stride: Int): ArrayData = {
    val n = tokens.numElements()
    if (stride == 1 && n < width) return new GenericArrayData(Array.empty[Any])
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      toks(i) = if (tokens.isNullAt(i)) null else tokens.getUTF8String(i)
      i += 1
    }
    val space = UTF8String.fromString(" ")
    val count = if (stride == 1) n - width + 1 else (n + width - 1) / width
    val out = new Array[Any](count)
    var c = 0
    while (c < count) {
      val start = c * stride
      val end = math.min(start + width, n)
      val parts = new Array[UTF8String](end - start)
      var j = start
      while (j < end) { parts(j - start) = toks(j); j += 1 }
      // concatWs skips null inputs — exactly array_join's behavior
      out(c) = UTF8String.concatWs(space, parts: _*)
      c += 1
    }
    new GenericArrayData(out)
  }

  private def isTerm(b: Byte): Boolean = b == '.' || b == '!' || b == '?'

  /** == filter(split(text, '[.!?]+\s+'), x -> length(trim(x)) > 0).
    *
    * Split semantics (Java Pattern.split, limit -1, as Spark's split):
    * a delimiter is a maximal run of [.!?] immediately followed by at
    * least one \s char, consuming the whole whitespace run (greedy \s+;
    * both classes are single ASCII bytes, disjoint, and no UTF-8
    * multi-byte sequence contains an ASCII byte, so the byte scan finds
    * exactly the regex matches). A terminator run NOT followed by
    * whitespace is not a delimiter. Leading/trailing/empty segments are
    * produced by split but then dropped by the filter together with
    * space-only segments — Spark's trim removes ASCII 32 ONLY, so a
    * segment like "\t" survives the HOF filter and survives here too. */
  def sentenceSplit(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    val out = new java.util.ArrayList[UTF8String]()
    def emit(from: Int, until: Int): Unit = {
      var p = from
      var keep = false
      while (p < until && !keep) {
        if (bytes(p) != 0x20) keep = true
        p += 1
      }
      if (keep) out.add(UTF8String.fromBytes(bytes, from, until - from))
    }
    var segStart = 0
    var i = 0
    while (i < n) {
      if (isTerm(bytes(i))) {
        var j = i
        while (j < n && isTerm(bytes(j))) j += 1
        if (j < n && isWs(bytes(j))) {
          var k = j
          while (k < n && isWs(bytes(k))) k += 1
          emit(segStart, i)
          segStart = k
          i = k
        } else i = j
      } else i += 1
    }
    emit(segStart, n)
    new GenericArrayData(out.toArray)
  }

  private def isAlpha(b: Byte): Boolean =
    (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')
  private def isDigit(b: Byte): Boolean = b >= '0' && b <= '9'
  /** [^A-Za-z0-9\s'] at byte level: multi-byte UTF-8 units are all
    * >= 0x80 (negative as Java bytes) and so land in this class, exactly
    * like the regex's "any other char". */
  private def isOther(b: Byte): Boolean =
    !isAlpha(b) && !isDigit(b) && !isWs(b) && b != '\''

  /** == regexp_extract_all(t,
    *      "'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s']+|\s+",
    *      0)
    * — the GPT-2-style BPE pre-tokenizer. Faithful to Java's
    * leftmost-first alternation:
    *  1. apostrophe + one of s|t|re|ve|m|ll|d (tried in that order);
    *     an apostrophe with no such suffix matches NO alternative (it is
    *     excluded from the "other" class), so the regex engine skips one
    *     char without emitting — replicated by the bare `i += 1`.
    *  2-4. one optional literal SPACE (0x20 only, not \s) + a run of
    *     alpha / digit / other. A space binds to the following run only
    *     when the run starts immediately after it.
    *  5. otherwise a maximal \s+ run.
    * All classes are single ASCII bytes, so the byte scan emits exactly
    * the regex's match sequence (TextStatsSpec pins it row-for-row). */
  def bpePreTokens(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    val out = new java.util.ArrayList[UTF8String]()
    def emit(from: Int, until: Int): Unit =
      out.add(UTF8String.fromBytes(bytes, from, until - from))
    def runEnd(from: Int, cls: Byte => Boolean): Int = {
      var j = from
      while (j < n && cls(bytes(j))) j += 1
      j
    }
    var i = 0
    while (i < n) {
      val b = bytes(i)
      if (b == '\'') {
        val rem = n - i - 1
        def at(k: Int): Byte = bytes(i + 1 + k)
        val sufLen =
          if (rem >= 1 && (at(0) == 's' || at(0) == 't')) 1
          else if (rem >= 2 && at(0) == 'r' && at(1) == 'e') 2
          else if (rem >= 2 && at(0) == 'v' && at(1) == 'e') 2
          else if (rem >= 1 && at(0) == 'm') 1
          else if (rem >= 2 && at(0) == 'l' && at(1) == 'l') 2
          else if (rem >= 1 && at(0) == 'd') 1
          else 0
        if (sufLen > 0) { emit(i, i + 1 + sufLen); i += 1 + sufLen }
        else i += 1 // no alternative matches a bare apostrophe
      } else if (isAlpha(b)) {
        val j = runEnd(i, isAlpha); emit(i, j); i = j
      } else if (isDigit(b)) {
        val j = runEnd(i, isDigit); emit(i, j); i = j
      } else if (b == 0x20 && i + 1 < n &&
          (isAlpha(bytes(i + 1)) || isDigit(bytes(i + 1)) ||
            isOther(bytes(i + 1)))) {
        val cls: Byte => Boolean =
          if (isAlpha(bytes(i + 1))) isAlpha
          else if (isDigit(bytes(i + 1))) isDigit
          else isOther
        val j = runEnd(i + 1, cls); emit(i, j); i = j
      } else if (isWs(b)) {
        val j = runEnd(i, isWs); emit(i, j); i = j
      } else { // "other" run (incl. all multi-byte chars)
        val j = runEnd(i, isOther); emit(i, j); i = j
      }
    }
    new GenericArrayData(out.toArray)
  }

  /** One-loop replacement for the three per-token rlike filters over a
    * BPE pre-token array:
    *   n_alpha = size(filter(bt, x -> x rlike '^ ?[A-Za-z]'))
    *   n_num   = size(filter(bt, x -> x rlike '^ ?[0-9]'))
    *   n_contr = size(filter(bt, x -> x rlike "^'"))
    * (anchored prefixes: ONE optional space, then the class). */
  def bpeClassCounts(tokens: ArrayData): InternalRow = {
    val n = tokens.numElements()
    var nAlpha = 0L
    var nNum = 0L
    var nContr = 0L
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val bytes = tokens.getUTF8String(i).getBytes
        if (bytes.length > 0) {
          if (bytes(0) == '\'') nContr += 1
          val p = if (bytes(0) == 0x20) 1 else 0
          if (p < bytes.length) {
            if (isAlpha(bytes(p))) nAlpha += 1
            else if (isDigit(bytes(p))) nNum += 1
          }
        }
      }
      i += 1
    }
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(3)
    row.setLong(0, nAlpha)
    row.setLong(1, nNum)
    row.setLong(2, nContr)
    row
  }

  /** == aggregate(merges, seq, (acc, mm) -> replace(acc,
    *      concat(chr(1), mm, chr(1)),
    *      concat(chr(1), replace(mm, chr(1), ''), chr(1))))
    * — the iterated-BPE merge application (d28/d54/d55, r19): for each
    * merge pair "a<0x01>b" IN RANK ORDER, replace every non-overlapping
    * "<0x01>a<0x01>b<0x01>" with "<0x01>ab<0x01>", scanning left to
    * right and continuing AFTER each replacement — UTF8String.replace's
    * exact scan, so back-to-back repeats sharing a boundary merge once
    * per pass, like the HOF chain. A null merge element nulls the whole
    * result exactly like the lambda (concat over null is null, replace
    * with a null pattern is null, and a null acc stays null). Byte-level
    * matching == string matching: the pattern is delimited by 0x01,
    * which is never a UTF-8 continuation byte. */
  def bpeApplyMerges(seq: UTF8String, merges: ArrayData): UTF8String = {
    val m = merges.numElements()
    var cur = seq.getBytes
    var i = 0
    while (i < m) {
      if (merges.isNullAt(i)) return null
      val mm = merges.getUTF8String(i).getBytes
      val pat = new Array[Byte](mm.length + 2)
      pat(0) = 1
      pat(pat.length - 1) = 1
      System.arraycopy(mm, 0, pat, 1, mm.length)
      var stripped = 0
      var j = 0
      while (j < mm.length) {
        if (mm(j) == 1) stripped += 1
        j += 1
      }
      val rep = new Array[Byte](mm.length + 2 - stripped)
      rep(0) = 1
      rep(rep.length - 1) = 1
      var k = 1
      j = 0
      while (j < mm.length) {
        if (mm(j) != 1) { rep(k) = mm(j); k += 1 }
        j += 1
      }
      cur = replaceAllBytes(cur, pat, rep)
      i += 1
    }
    UTF8String.fromBytes(cur)
  }

  /** Non-overlapping left-to-right byte replace — UTF8String.replace's
    * scan (find from 0; after a match, resume at match end). */
  private def replaceAllBytes(src: Array[Byte], pat: Array[Byte],
      rep: Array[Byte]): Array[Byte] = {
    if (src.length == 0 || pat.length == 0) return src
    var end = bytesIndexOf(src, pat, 0)
    if (end < 0) return src
    val out = new java.io.ByteArrayOutputStream(src.length + 16)
    var start = 0
    while (end >= 0) {
      out.write(src, start, end - start)
      out.write(rep, 0, rep.length)
      start = end + pat.length
      end = bytesIndexOf(src, pat, start)
    }
    out.write(src, start, src.length - start)
    out.toByteArray
  }

  private def bytesIndexOf(src: Array[Byte], pat: Array[Byte],
      from: Int): Int = {
    val last = src.length - pat.length
    var i = math.max(from, 0)
    while (i <= last) {
      var j = 0
      while (j < pat.length && src(i + j) == pat(j)) j += 1
      if (j == pat.length) return i
      i += 1
    }
    -1
  }

  /** == the iterated-BPE adjacent-pair extraction over a boundary-marked
    * merge string: with
    *   mt = slice(split(ms, chr(1)), 2, greatest(size(split(ms, chr(1))) - 2, 0))
    * (the token list between the sentinel boundaries; split at limit -1
    * keeps leading/trailing empties, so the piece list is exactly the
    * k+1 segments around the k 0x01 bytes and dropping the first and
    * last piece leaves the tokens), the result is
    *   IF(size(mt) >= 2,
    *      transform(sequence(1, size(mt) - 1),
    *        i -> concat(element_at(mt, i), chr(1), element_at(mt, i+1))),
    *      array()).
    * Each pair is a CONTIGUOUS byte slice of ms (token, its 0x01
    * boundary, next token), so the scan emits k-2 substring slices —
    * no regex split, no intermediate array, no lambda dispatch. */
  def bpeSeqPairs(seq: UTF8String): ArrayData = {
    val bytes = seq.getBytes
    val n = bytes.length
    var k = 0
    var i = 0
    while (i < n) {
      if (bytes(i) == 1) k += 1
      i += 1
    }
    if (k < 3) return new GenericArrayData(Array.empty[Any])
    val marks = new Array[Int](k)
    var mi = 0
    i = 0
    while (i < n) {
      if (bytes(i) == 1) { marks(mi) = i; mi += 1 }
      i += 1
    }
    val out = new Array[Any](k - 2)
    i = 0
    while (i <= k - 3) {
      out(i) = UTF8String.fromBytes(bytes, marks(i) + 1,
        marks(i + 2) - marks(i) - 1)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** == size(filter(tokens, t -> t IN (<words>))): null elements never
    * match (SQL IN over a null yields null, filter keeps only true). */
  def stopCount(tokens: ArrayData, stops: Array[UTF8String]): Int = {
    val n = tokens.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val t = tokens.getUTF8String(i)
        var j = 0
        var hit = false
        while (j < stops.length && !hit) {
          if (stops(j).equals(t)) hit = true
          j += 1
        }
        if (hit) c += 1
      }
      i += 1
    }
    c
  }

  /** == aggregate(tokens, 0L, (acc, t) -> acc + length(t)): one null
    * element nulls the whole sum (acc + NULL = NULL and stays NULL);
    * empty array = 0. Returns null via the boxed Long. */
  def tokCharsSum(tokens: ArrayData): java.lang.Long = {
    val n = tokens.numElements()
    var s = 0L
    var i = 0
    while (i < n) {
      if (tokens.isNullAt(i)) return null
      s += tokens.getUTF8String(i).numChars()
      i += 1
    }
    java.lang.Long.valueOf(s)
  }

  /** == size(regexp_extract_all(text, '[<chars>]', 0)) for an ASCII char
    * class: each match is one char, and in UTF-8 no multi-byte sequence
    * contains an ASCII byte, so counting set-member bytes is exact. */
  def asciiSetCount(text: UTF8String, set: Array[Boolean]): Int = {
    val bytes = text.getBytes
    var c = 0
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (b >= 0 && set(b)) c += 1
      i += 1
    }
    c
  }

  case class WsTokens(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"ws_tokens needs STRING, got $other")
    }
    override def nullSafeEval(t: Any): Any =
      wsTokens(t.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, t =>
        s"${ev.value} = graft.functions.TextStats.wsTokens($t);")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "ws_tokens"
  }

  case class QualityStats(child: Expression, stopWords: Seq[String])
      extends UnaryExpression {
    @transient private lazy val stops: Array[UTF8String] =
      stopWords.map(UTF8String.fromString).toArray
    override def dataType: DataType = StructType(Seq(
      StructField("n_tok", LongType, nullable = false),
      StructField("tok_chars", LongType, nullable = true),
      StructField("n_stop", LongType, nullable = false),
      StructField("n_tri_distinct", LongType, nullable = false)))
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"quality_stats needs ARRAY<STRING>, got $other")
    }
    override def nullSafeEval(a: Any): Any =
      qualityStats(a.asInstanceOf[ArrayData], stops)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val stopsRef = ctx.addReferenceObj("qualityStops", stops,
        "org.apache.spark.unsafe.types.UTF8String[]")
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.TextStats.qualityStats($a, $stopsRef);")
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "quality_stats"
  }

  case class GramJoins(child: Expression, width: Int, stride: Int)
      extends UnaryExpression {
    require(stride == 1 || stride == width,
      "gram_joins supports window (stride 1) or chunk (stride == width) mode")
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"gram_joins needs ARRAY<STRING>, got $other")
    }
    override def nullSafeEval(a: Any): Any =
      gramJoins(a.asInstanceOf[ArrayData], width, stride)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.TextStats.gramJoins($a, $width, $stride);")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "gram_joins"
  }

  case class BpePreTokens(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bpe_pre_tokens needs STRING, got $other")
    }
    override def nullSafeEval(t: Any): Any =
      bpePreTokens(t.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, t =>
        s"${ev.value} = graft.functions.TextStats.bpePreTokens($t);")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "bpe_pre_tokens"
  }

  case class BpeClassCounts(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StructType(Seq(
      StructField("n_alpha", LongType, nullable = false),
      StructField("n_num", LongType, nullable = false),
      StructField("n_contr", LongType, nullable = false)))
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bpe_class_counts needs ARRAY<STRING>, got $other")
    }
    override def nullSafeEval(a: Any): Any =
      bpeClassCounts(a.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.TextStats.bpeClassCounts($a);")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "bpe_class_counts"
  }

  case class SentenceSplit(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"sentence_split needs STRING, got $other")
    }
    override def nullSafeEval(t: Any): Any =
      sentenceSplit(t.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, t =>
        s"${ev.value} = graft.functions.TextStats.sentenceSplit($t);")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "sentence_split"
  }

  case class StopCount(child: Expression, stopWords: Seq[String])
      extends UnaryExpression {
    @transient private lazy val stops: Array[UTF8String] =
      stopWords.map(UTF8String.fromString).toArray
    override def dataType: DataType = IntegerType
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"stop_count needs ARRAY<STRING>, got $other")
    }
    override def nullSafeEval(a: Any): Any =
      stopCount(a.asInstanceOf[ArrayData], stops)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val stopsRef = ctx.addReferenceObj("stopCountStops", stops,
        "org.apache.spark.unsafe.types.UTF8String[]")
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.TextStats.stopCount($a, $stopsRef);")
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "stop_count"
  }

  case class TokCharsSum(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"tok_chars_sum needs ARRAY<STRING>, got $other")
    }
    override def nullSafeEval(a: Any): Any =
      tokCharsSum(a.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => s"""
        java.lang.Long ${ev.value}Boxed =
          graft.functions.TextStats.tokCharsSum($a);
        if (${ev.value}Boxed == null) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = ${ev.value}Boxed.longValue();
        }""")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "tok_chars_sum"
  }

  case class AsciiSetCount(child: Expression, chars: String)
      extends UnaryExpression {
    require(chars.forall(_ < 128), "asciiSetCount needs an ASCII char class")
    @transient private lazy val set: Array[Boolean] = {
      val a = new Array[Boolean](128)
      chars.foreach(c => a(c.toInt) = true)
      a
    }
    override def dataType: DataType = IntegerType
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"ascii_set_count needs STRING, got $other")
    }
    override def nullSafeEval(t: Any): Any =
      asciiSetCount(t.asInstanceOf[UTF8String], set)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val setRef = ctx.addReferenceObj("asciiSet", set, "boolean[]")
      nullSafeCodeGen(ctx, ev, t =>
        s"${ev.value} = graft.functions.TextStats.asciiSetCount($t, $setRef);")
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "ascii_set_count"
  }

  case class BpeApplyMerges(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = StringType
    // a null MERGE ELEMENT nulls the output even for non-null inputs
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (StringType, ArrayType(StringType, _)) =>
          TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"bpe_apply_merges needs (STRING, ARRAY<STRING>), got $other")
      }
    override def nullSafeEval(seq: Any, merges: Any): Any =
      bpeApplyMerges(seq.asInstanceOf[UTF8String],
        merges.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (seq, merges) => s"""
        org.apache.spark.unsafe.types.UTF8String ${ev.value}Tmp =
          graft.functions.TextStats.bpeApplyMerges($seq, $merges);
        if (${ev.value}Tmp == null) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = ${ev.value}Tmp;
        }""")
    override protected def withNewChildrenInternal(newLeft: Expression,
        newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
    override def prettyName: String = "bpe_apply_merges"
  }

  case class BpeSeqPairs(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bpe_seq_pairs needs STRING, got $other")
    }
    override def nullSafeEval(t: Any): Any =
      bpeSeqPairs(t.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, t =>
        s"${ev.value} = graft.functions.TextStats.bpeSeqPairs($t);")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "bpe_seq_pairs"
  }

  def wsTokensCol(text: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      WsTokens(org.apache.spark.sql.graft.ColumnBridge.expression(text)))
  def qualityStatsCol(tokens: Column, stops: Seq[String]): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      QualityStats(org.apache.spark.sql.graft.ColumnBridge.expression(tokens),
        stops))
  /** winsExpr replacement: one string per full `width`-token window. */
  def windowJoinsCol(tokens: Column, width: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      GramJoins(org.apache.spark.sql.graft.ColumnBridge.expression(tokens),
        width, 1))
  /** chunksExpr replacement: ceil(n/width) strings, last partial. */
  def chunkJoinsCol(tokens: Column, width: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      GramJoins(org.apache.spark.sql.graft.ColumnBridge.expression(tokens),
        width, width))
  /** The BPE pre-tokenizer regexp_extract_all replacement. */
  def bpePreTokensCol(text: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      BpePreTokens(org.apache.spark.sql.graft.ColumnBridge.expression(text)))
  /** The three rlike class-count filters in one loop. */
  def bpeClassCountsCol(tokens: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      BpeClassCounts(org.apache.spark.sql.graft.ColumnBridge.expression(tokens)))
  /** filter(split(text,'[.!?]+\s+'), x -> length(trim(x)) > 0)
    * replacement — the shared sentence/line axis. */
  def sentencesCol(text: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      SentenceSplit(org.apache.spark.sql.graft.ColumnBridge.expression(text)))
  /** size(filter(tk, t -> t IN (<words>))) replacement (INT like size). */
  def stopCountCol(tokens: Column, stops: Seq[String]): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      StopCount(org.apache.spark.sql.graft.ColumnBridge.expression(tokens),
        stops))
  /** aggregate(tk, 0L, (acc, t) -> acc + length(t)) replacement. */
  def tokCharsCol(tokens: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      TokCharsSum(org.apache.spark.sql.graft.ColumnBridge.expression(tokens)))
  /** size(regexp_extract_all(text, '[<chars>]', 0)) replacement for an
    * ASCII char class (INT like size). */
  def asciiSetCountCol(text: Column, chars: String): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      AsciiSetCount(org.apache.spark.sql.graft.ColumnBridge.expression(text),
        chars))
  /** The iterated-BPE aggregate/replace merge chain replacement. */
  def bpeApplyMergesCol(seq: Column, merges: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      BpeApplyMerges(org.apache.spark.sql.graft.ColumnBridge.expression(seq),
        org.apache.spark.sql.graft.ColumnBridge.expression(merges)))
  /** The iterated-BPE split+slice+transform pair extraction replacement. */
  def bpeSeqPairsCol(seq: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      BpeSeqPairs(org.apache.spark.sql.graft.ColumnBridge.expression(seq)))
}
