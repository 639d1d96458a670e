package graft.analytics

import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Web-scale ingestion (r10): the two operators that sit at the FRONT
  * of every web-derived training corpus (CCNet / C4 / FineWeb all
  * start here) and were the last missing tier of the LLM-pipeline
  * story:
  *
  *  - WARC shard parsing — Common Crawl publishes crawl data as
  *    WARC/1.0 files (ISO 28500): records framed by a version line,
  *    case-insensitive named headers, a Content-Length'd payload, and
  *    a blank-line terminator. Both sides are hand-rolled against the
  *    public spec (the JDK has no WARC support): the writer emits
  *    warcinfo + per-fetch request/response records with shuffled
  *    header order, the parser re-frames strictly (version line,
  *    header fold, exact Content-Length, CRLFCRLF trailer) and
  *    rejects corruption loudly. The DuckDB oracle replays record
  *    counts, response payload bytes, and a position-weighted
  *    checksum arithmetically — a framing slip of even one byte
  *    shifts the checksum.
  *
  *  - HTML main-text extraction — boilerplate removal (the
  *    trafilatura/jusText step): drop script/style and nav/header/
  *    footer/aside chrome, strip tags, decode entities, collapse
  *    whitespace. The synthesized page hides the real document text
  *    inside <p> blocks in <main> surrounded by adversarial chrome (a
  *    script containing bare `<`/`>`, a footer containing its own
  *    <p>, entities in the nav), so the extracted text sha-matches
  *    the original document IFF the extractor does real block-level
  *    removal, not naive tag stripping.
  *
  * Scale design: both are MAP-ONLY — zero exchanges at any corpus
  * size; the extraction chain is entirely codegen'd built-in
  * expressions (`regexp_replace`/`split`/`transform`/`slice`), so it
  * stays inside one WholeStageCodegen span, and the WARC walk is the
  * same per-partition iterator pattern as the tar/AVI parsers
  * (codec-init-free, partition-local).
  */
object Web {

  // ---------------------------------------------------------------
  // WARC/1.0 shard: writer + strict parser
  // ---------------------------------------------------------------

  /** Fetches per shard and per-fetch response payload sizes/bytes —
    * the same arithmetic-rule style as the tar/mp4 constructions. */
  private def warcFetches(id: Long): Int = 1 + (id % 3).toInt
  private def warcPayloadSize(id: Long, r: Int): Int =
    20 + ((id * 31L + r * 7L) % 180L).toInt
  private def warcPayloadByte(id: Long, r: Int, i: Int): Int =
    ((id * 17L + r * 5L + i * 13L) % 251L).toInt
  private def warcUri(id: Long, r: Int): String =
    s"https://example.com/doc$id/$r"

  private val CRLF = "\r\n"

  /** One record: version line + headers + blank + payload + blank. */
  private def warcRecord(headers: Seq[(String, String)],
      payload: Array[Byte]): Array[Byte] = {
    val head = new StringBuilder("WARC/1.0").append(CRLF)
    headers.foreach { case (k, v) => head.append(k).append(": ").append(v).append(CRLF) }
    head.append("Content-Length: ").append(payload.length).append(CRLF)
    head.append(CRLF)
    head.toString.getBytes("US-ASCII") ++ payload ++
      (CRLF + CRLF).getBytes("US-ASCII")
  }

  /** Deterministic urn:uuid record id (shape only — parsers treat it
    * as an opaque token). */
  private def recordId(id: Long, r: Int, kind: Int): String =
    f"<urn:uuid:${id}%08x-0000-4000-8000-${r * 16 + kind}%012x>"

  /** A full shard: warcinfo, then (request, response) per fetch. The
    * three record types carry their headers in DIFFERENT orders and
    * mixed case — the spec says header names are case-insensitive and
    * order-free, and a positional parser must fail here. */
  private[graft] def warcBytes(id: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream
    val info = ("software: graft\r\nformat: WARC File Format 1.0\r\n")
      .getBytes("US-ASCII")
    out.write(warcRecord(Seq(
      "WARC-Type" -> "warcinfo",
      "WARC-Date" -> "2026-01-01T00:00:00Z",
      "WARC-Record-ID" -> recordId(id, 0, 0),
      "Content-Type" -> "application/warc-fields"), info))
    (0 until warcFetches(id)).foreach { r =>
      val uri = warcUri(id, r)
      val req = s"GET /doc$id/$r HTTP/1.1\r\nHost: example.com\r\n\r\n"
        .getBytes("US-ASCII")
      out.write(warcRecord(Seq(
        "WARC-Record-ID" -> recordId(id, r, 1),
        "warc-type" -> "request", // case-insensitivity probe
        "WARC-Target-URI" -> uri,
        "WARC-Date" -> "2026-01-01T00:00:00Z",
        "Content-Type" -> "application/http; msgtype=request"), req))
      val body = Array.tabulate(warcPayloadSize(id, r))(i =>
        warcPayloadByte(id, r, i).toByte)
      out.write(warcRecord(Seq(
        "WARC-Date" -> "2026-01-01T00:00:00Z",
        "Content-Type" -> "application/http; msgtype=response",
        "WARC-Type" -> "response",
        "WARC-Target-URI" -> uri,
        "WARC-Record-ID" -> recordId(id, r, 2)), body))
    }
    out.toByteArray
  }

  /** Strict re-frame: (nRecords, nResponses, nRequests, sumPayload,
    * sumUriLen, checksum). Response payloads feed sum/positional
    * checksum; URI lengths come from the parsed WARC-Target-URI
    * header. Any framing damage rejects loudly. */
  private[graft] def parseWarc(bytes: Array[Byte]): (Long, Long, Long, Long, Long, Long) = {
    var p = 0
    var nRec = 0L; var nResp = 0L; var nReq = 0L
    var sumPayload = 0L; var sumUri = 0L; var ck = 0L
    def line(): String = {
      val nl = {
        var q = p
        while (q + 1 < bytes.length &&
          !(bytes(q) == '\r' && bytes(q + 1) == '\n')) q += 1
        require(q + 1 < bytes.length, s"unterminated line at $p")
        q
      }
      val s = new String(bytes, p, nl - p, "US-ASCII")
      p = nl + 2
      s
    }
    while (p < bytes.length) {
      require(line() == "WARC/1.0", "bad WARC version line")
      var tpe = ""; var uri = ""; var len = -1L
      var h = line()
      while (h.nonEmpty) {
        val c = h.indexOf(':')
        require(c > 0, s"malformed header '$h'")
        val k = h.substring(0, c).trim.toLowerCase
        val v = h.substring(c + 1).trim
        k match {
          case "warc-type"       => tpe = v
          case "warc-target-uri" => uri = v
          case "content-length"  => len = v.toLong
          case _                 => () // unknown headers skip (spec)
        }
        h = line()
      }
      require(len >= 0, "missing Content-Length")
      require(p + len + 4 <= bytes.length, s"truncated payload at $p")
      nRec += 1
      tpe match {
        case "response" =>
          nResp += 1; sumPayload += len; sumUri += uri.length
          val r = nResp // 1-based fetch index — matches the oracle's r+1
          var i = 0
          while (i < len) {
            ck += r * (i + 1) * (bytes(p + i.toInt) & 0xff)
            i += 1
          }
        case "request"  => nReq += 1
        case "warcinfo" => ()
        case other      => require(other.nonEmpty, "missing WARC-Type")
      }
      p += len.toInt
      require(bytes(p) == '\r' && bytes(p + 1) == '\n' &&
        bytes(p + 2) == '\r' && bytes(p + 3) == '\n',
        s"missing record terminator at $p")
      p += 4
    }
    (nRec, nResp, nReq, sumPayload, sumUri, ck)
  }

  /** Synthesize → strictly re-frame a WARC shard per document. */
  def warcParse(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // fan the 8-byte id stream to full width before the parse loop —
    // at test SF the corpus is ONE parquet split and the synth+parse
    // work would serialize on a single task (the multimodal_mjpeg
    // finding; one shared policy in Multimodal.fannedIds)
    Multimodal.fannedIds(s, d)
      .mapPartitions(_.map { id =>
        val (nr, nresp, nreq, sp, su, ck) = parseWarc(warcBytes(id))
        (id, nr, nresp, nreq, sp, su, ck)
      })
      .toDF("asset_id", "n_records", "n_responses", "n_requests",
        "sum_payload", "sum_uri_len", "checksum")
  }

  // ---------------------------------------------------------------
  // HTML main-text extraction
  // ---------------------------------------------------------------

  /** Words per <p> block. */
  private val WordsPerPara = 12

  /** ceil(nWords / WordsPerPara) — ONE definition shared by the page
    * synthesis and the n_paras output column, so the reported count
    * can never drift from the page actually synthesized. (Column./ is
    * DOUBLE division — floor+cast for the integral ceil-div that
    * sequence() needs.) */
  private def nParasOf(textCol: Column): Column =
    floor((size(split(textCol, " ")) + lit(WordsPerPara - 1)) /
      lit(WordsPerPara)).cast("int")

  /** Page synthesis: the real document text split into <p> blocks
    * inside <main>, wrapped in adversarial chrome — a <script> with
    * bare `<`/`>` (tags-only strippers corrupt on it), a <footer>
    * containing its own <p> (block removal must precede paragraph
    * harvesting), and entities in the nav/footer. */
  private def htmlOf(idCol: Column, textCol: Column): Column = {
    val words = split(textCol, " ")
    val nParas = nParasOf(textCol)
    val paras = array_join(
      transform(sequence(lit(0), nParas - 1), i =>
        concat(lit("<p>"),
          array_join(slice(words, i * WordsPerPara + 1, lit(WordsPerPara)), " "),
          lit("</p>"))), "")
    concat(
      lit("<!DOCTYPE html><html><head><title>Doc "), idCol,
      lit("</title><style>body{color:#000;font-size:14px}</style>" +
        "<script>var x=1&amp;&amp;2;if(x<3){x=4>2?1:0;}</script>" +
        "</head><body><nav><ul><li><a href=\"/\">home &gt; docs</a>" +
        "</li></ul></nav><header><h1>doc "), idCol,
      lit("</h1></header><main>"), paras,
      lit("</main><footer><p>&copy; 2026 example&nbsp;corp &amp; " +
        "partners</p></footer></body></html>"))
  }

  /** The extractor: block-level boilerplate removal, then tag strip,
    * entity decode, whitespace collapse. Pure codegen'd built-ins. */
  private[graft] def extractMainText(html: Column): Column = {
    // 1. script/style bodies are NOT text — drop whole blocks first
    val noScript = regexp_replace(html,
      "(?s)<script\\b[^>]*>.*?</script>|<style\\b[^>]*>.*?</style>", " ")
    // 2. the whole <head> (title text is NOT page text — the classic
    //    naive-stripper leak) and chrome blocks are boilerplate; the
    //    \b keeps <head…> from also swallowing <header…> prefixes
    val noChrome = regexp_replace(noScript,
      "(?s)<head\\b[^>]*>.*?</head>|<nav\\b[^>]*>.*?</nav>" +
        "|<header\\b[^>]*>.*?</header>|<footer\\b[^>]*>.*?</footer>" +
        "|<aside\\b[^>]*>.*?</aside>", " ")
    // 3. remaining tags become whitespace (so adjacent <p> blocks
    //    don't glue their words together)
    val noTags = regexp_replace(noChrome, "<[^>]*>", " ")
    // 4. entity decode (the common five; order matters — &amp; last
    //    so freshly-decoded ampersands don't re-decode)
    val decoded = regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(regexp_replace(noTags,
        "&lt;", "<"), "&gt;", ">"), "&nbsp;", " "), "&copy;", "©"),
      "&amp;", "&")
    // 5. whitespace collapse + trim
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** documents → synthesized page → extracted main text; the sha
    * pins bit-exact recovery of the original text. */
  def htmlExtract(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val html = htmlOf(col("doc_id"), col("text"))
    val extracted = extractMainText(html)
    docs.select(
      col("doc_id"),
      nParasOf(col("text")).cast("long").as("n_paras"),
      length(extracted).cast("long").as("n_chars"),
      sha2(extracted, 256).as("extracted_sha"))
  }

  // ---------------------------------------------------------------
  // URL canonicalization dedup
  // ---------------------------------------------------------------

  /** The FIRST dedup a web pipeline runs — long before any content
    * hashing: the same resource arrives under many URL spellings
    * (mixed-case host, explicit default port, unsorted query params,
    * trailing slash, fragments), and canonicalizing before grouping
    * collapses them for free. Per document a messy variant is
    * synthesized (the variants co-rotate on doc_id moduli), then
    * genuinely normalized with codegen'd string surgery: fragment
    * strip, host lowercase, default-port strip, trailing-slash strip,
    * query-param SORT. Groups on the canonical key — ONE exchange at
    * any scale, and the key is the short canonical URL, never the
    * document payload. If any normalization step breaks, a group
    * splits and both its count and its min-doc keeper shift. */
  def urlCanonDedup(s: SparkSession, d: String): DataFrame = {
    val id = col("doc_id")
    val messy = concat(
      lit("https://"),
      when(id % 2 === 0, lit("ExAmple.COM")).otherwise(lit("example.com")),
      when(id % 3 === 0, lit(":443")).otherwise(lit("")),
      lit("/d/"), (id % 50).cast("string"),
      when(id % 5 === 0, lit("/")).otherwise(lit("")),
      when(id % 2 === 0, lit("?b=2&a=1")).otherwise(lit("?a=1&b=2")),
      when(id % 7 === 0, lit("#sec")).otherwise(lit("")))
    val noFrag = regexp_replace(messy, "#.*$", "")
    val host = lower(regexp_extract(noFrag, "^[a-z]+://([^/?#]+)", 1))
    val hostNoPort = regexp_replace(host, ":443$", "")
    val path = regexp_extract(noFrag, "^[a-z]+://[^/?#]+([^?#]*)", 1)
    val pathNorm = regexp_replace(path, "/$", "")
    val query = regexp_extract(noFrag, "\\?(.*)$", 1)
    val qNorm = when(query === "", lit("")).otherwise(
      concat(lit("?"), array_join(sort_array(split(query, "&")), "&")))
    val canon = concat(lit("https://"), hostNoPort, pathNorm, qNorm)
    documents(s, d)
      .select(id, canon.as("canon_url"))
      .groupBy(col("canon_url"))
      .agg(count(lit(1)).as("n_dups"), min(col("doc_id")).as("keeper"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "warc_parse"        -> warcParse _,
    "text_html_extract" -> htmlExtract _,
    "url_canon_dedup"   -> urlCanonDedup _,
  )

  val oracle: Map[String, String] = Map(
    // the WARC construction replayed arithmetically: record counts
    // from the fetch rule, response payload sums/bytes from the size/
    // byte rules, URI lengths from the string rule, and a (fetch,
    // position)-weighted checksum a one-byte framing slip shifts
    "warc_parse" ->
      """WITH a AS (
          SELECT doc_id, 1 + doc_id % 3 AS nf FROM documents),
        f AS (
          SELECT a.doc_id, u.r,
            20 + (a.doc_id * 31 + u.r * 7) % 180 AS sz,
            length('https://example.com/doc' || a.doc_id || '/' || u.r)
              AS ulen
          FROM a, unnest(generate_series(0, a.nf - 1)) AS u(r)),
        ff AS (
          SELECT doc_id, count(*) AS nresp, sum(sz) AS sp,
            sum(ulen) AS su
          FROM f GROUP BY doc_id),
        bb AS (
          SELECT f.doc_id,
            sum((f.r + 1) * (v.i + 1)
              * ((f.doc_id * 17 + f.r * 5 + v.i * 13) % 251)) AS ck
          FROM f, unnest(generate_series(0, f.sz - 1)) AS v(i)
          GROUP BY f.doc_id)
        SELECT ff.doc_id AS asset_id,
          CAST(1 + 2 * ff.nresp AS BIGINT) AS n_records,
          CAST(ff.nresp AS BIGINT) AS n_responses,
          CAST(ff.nresp AS BIGINT) AS n_requests,
          CAST(ff.sp AS BIGINT) AS sum_payload,
          CAST(ff.su AS BIGINT) AS sum_uri_len,
          CAST(bb.ck AS BIGINT) AS checksum
        FROM ff JOIN bb ON bb.doc_id = ff.doc_id""",
    // bit-exact recovery: the extractor must hand back EXACTLY the
    // original document text (sha + length), and the paragraph count
    // replays the 12-words-per-<p> synthesis rule
    // every messy variant of path-group k canonicalizes to ONE fixed
    // spelling — the oracle states that spelling literally, so a
    // broken normalization step splits a group and fails all three
    // columns
    "url_canon_dedup" ->
      """SELECT 'https://example.com/d/' || (doc_id % 50) || '?a=1&b=2'
            AS canon_url,
          CAST(count(*) AS BIGINT) AS n_dups,
          CAST(min(doc_id) AS BIGINT) AS keeper
        FROM documents GROUP BY doc_id % 50""",
    "text_html_extract" ->
      """SELECT doc_id,
          CAST((array_length(string_split(text, ' ')) + 11) // 12
            AS BIGINT) AS n_paras,
          CAST(length(text) AS BIGINT) AS n_chars,
          sha256(text) AS extracted_sha
        FROM documents""",
  )
}
