package graft.ext

/** A typed per-file column bound carried by manifest `#st=` lines and
  * consulted by [[graft.plans.StatsFilePruning]] at plan time.
  *
  * Two kinds cover every supported stat column:
  *  - [[StatBound.L]] — an exact long: the value itself for integral
  *    columns, epoch DAYS for dates, epoch MICROS for timestamps, the
  *    unscaled long for decimals of precision ≤ 18 (the column's own
  *    scale; plan-time literals only match when their DecimalType
  *    equals the column's, so both sides agree on the scale).
  *  - [[StatBound.S]] — UTF-8 bytes of a string bound, compared
  *    unsigned-bytewise (UTF8String/DuckDB memcmp order; UTF-8
  *    preserves code-point order, so the two agree). Stored bounds
  *    are TRUNCATED to [[StatBound.TruncLen]] code points, the
  *    Iceberg model: a truncated lower bound is a prefix (≤ the true
  *    min — widens downward); an upper bound that truncates has its
  *    last code point INCREMENTED (skipping the surrogate gap,
  *    carrying left on overflow) so it exceeds every string sharing
  *    the prefix — widens upward. Widening may keep an extra file;
  *    it can never drop a matching one.
  *
  * Wire format (the manifest token): `L` renders as the bare decimal
  * long — byte-compatible with pre-round-15 integral-only manifests —
  * and `S` as `s` + lowercase hex of the bytes (hex never collides
  * with the stats line's `:`/`|` delimiters). An empty token means "no
  * non-null values"; an unrecognized token reads as ABSENT, so a
  * future format extension degrades to "unattested column", never to
  * a wrong prune. */
sealed trait StatBound {
  /** Wire token for the manifest `#st=` line. */
  def token: String
}

object StatBound {

  /** Exact long bound (integral / date-days / timestamp-micros /
    * decimal-unscaled). */
  final case class L(v: Long) extends StatBound {
    def token: String = v.toString
  }

  /** UTF-8 byte bound for strings, unsigned-bytewise order. */
  final case class S(bytes: Array[Byte]) extends StatBound {
    def token: String = "s" + bytes.map(b => f"${b & 0xff}%02x").mkString
    // Array equality is reference equality; bounds live in Maps the
    // specs compare structurally, so compare contents
    override def equals(o: Any): Boolean = o match {
      case S(b) => java.util.Arrays.equals(bytes, b)
      case _ => false
    }
    override def hashCode: Int = java.util.Arrays.hashCode(bytes)
    override def toString: String =
      s"S(${new String(bytes, java.nio.charset.StandardCharsets.UTF_8)})"
  }

  /** Bounds of one kind compare; mixed kinds return None and every
    * caller treats that as "no information" (keep the file). */
  def cmp(a: StatBound, b: StatBound): Option[Int] = (a, b) match {
    case (L(x), L(y)) => Some(java.lang.Long.compare(x, y))
    case (S(x), S(y)) => Some(java.util.Arrays.compareUnsigned(x, y))
    case _ => None
  }

  def lte(a: StatBound, b: StatBound): Boolean = cmp(a, b).exists(_ <= 0)
  def gte(a: StatBound, b: StatBound): Boolean = cmp(a, b).exists(_ >= 0)

  /** Parse a manifest token: bare long → L, `s<hex>` → S, anything
    * else (including empty) → None. */
  def decode(token: String): Option[StatBound] =
    if (token.isEmpty) None
    else if (token.charAt(0) == 's') {
      val hex = token.substring(1)
      if (hex.length % 2 != 0 ||
          !hex.forall(c => (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f')))
        None
      else Some(S(hex.grouped(2)
        .map(h => Integer.parseInt(h, 16).toByte).toArray))
    } else token.toLongOption.map(L.apply)

  /** Truncation length for string bounds, in Unicode code points —
    * the Iceberg default width class: long document prefixes stay
    * manifest-cheap while real-world predicates (status codes, language
    * tags, URL prefixes) still separate. */
  val TruncLen = 16

  private def codePoints(s: String): Array[Int] =
    s.codePoints().toArray

  /** Lower string bound: the ≤-TruncLen-code-point prefix — always a
    * valid lower bound (a prefix is ≤ the full string bytewise). */
  def truncMin(s: String): S = {
    val cps = codePoints(s)
    val kept = if (cps.length <= TruncLen) s
      else new String(cps, 0, TruncLen)
    S(kept.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** Upper string bound: exact when the string fits; otherwise the
    * truncated prefix with its last code point incremented (carrying
    * left past unincrementable positions, skipping the surrogate
    * range). None when no position can be incremented — every kept
    * code point is U+10FFFF — in which case the caller must leave the
    * column unattested for the file (never narrow a bound). */
  def truncMax(s: String): Option[S] = {
    val cps = codePoints(s)
    if (cps.length <= TruncLen)
      return Some(S(s.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    incremented(cps.take(TruncLen))
  }

  /** The least string strictly GREATER than every string with prefix
    * `s` — the upper bound a `LIKE 's%'`/StartsWith predicate needs:
    * increment the last code point (carrying left; surrogate gap
    * skipped). None when nothing can increment (prefix all U+10FFFF
    * → treat the prefix match as upper-unbounded). */
  def prefixUpper(s: String): Option[S] = incremented(codePoints(s))

  private def incremented(kept: Array[Int]): Option[S] = {
    var i = kept.length - 1
    while (i >= 0) {
      val cp = kept(i)
      val next =
        if (cp == 0xD7FF) 0xE000 // skip the surrogate gap
        else if (cp >= 0x10FFFF) -1 // cannot increment; carry left
        else cp + 1
      if (next >= 0) {
        kept(i) = next
        val out = new String(kept, 0, i + 1)
        return Some(S(out.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      }
      i -= 1
    }
    None
  }
}
