package graft.embed

import java.io.{ByteArrayOutputStream, InputStream}
import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets

/** Minimal JSON codec for the embedding wire format — hand-rolled because the
  * build is dependency-free by design (only Spark's jars). Covers exactly the
  * JSON subset the OpenAI-style embeddings endpoint speaks: objects, arrays,
  * strings (with escapes), numbers, booleans, null. Not a general-purpose
  * parser; both ends of the contract live in this repo's tests plus any
  * OpenAI-compatible server.
  */
private[graft] object MiniJson {

  def escape(s: String): String = {
    val b = new StringBuilder(s.length + 8)
    s.foreach {
      case '"' => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.toString
  }

  sealed trait Value
  final case class JObj(fields: Map[String, Value]) extends Value
  final case class JArr(items: Vector[Value]) extends Value
  final case class JStr(s: String) extends Value
  final case class JNum(d: Double) extends Value
  final case class JBool(b: Boolean) extends Value
  case object JNull extends Value

  def parse(s: String): Value = {
    val p = new Parser(s)
    val v = p.value()
    p.skipWs()
    require(p.eof, s"trailing content at offset ${p.pos}")
    v
  }

  private final class Parser(s: String) {
    var pos = 0
    def eof: Boolean = pos >= s.length
    def skipWs(): Unit = while (!eof && s.charAt(pos).isWhitespace) pos += 1
    private def expect(c: Char): Unit = {
      require(!eof && s.charAt(pos) == c, s"expected '$c' at offset $pos")
      pos += 1
    }
    def value(): Value = {
      skipWs()
      require(!eof, "unexpected end of input")
      s.charAt(pos) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => JStr(str())
        case 't' => lit("true", JBool(true))
        case 'f' => lit("false", JBool(false))
        case 'n' => lit("null", JNull)
        case _ => num()
      }
    }
    private def lit(word: String, v: Value): Value = {
      require(s.regionMatches(pos, word, 0, word.length), s"bad literal at offset $pos")
      pos += word.length; v
    }
    private def obj(): JObj = {
      expect('{'); skipWs()
      val b = Map.newBuilder[String, Value]
      if (!eof && s.charAt(pos) == '}') { pos += 1; return JObj(b.result()) }
      var done = false
      while (!done) {
        skipWs()
        val k = str()
        skipWs(); expect(':')
        b += (k -> value())
        skipWs()
        if (!eof && s.charAt(pos) == ',') pos += 1
        else { expect('}'); done = true }
      }
      JObj(b.result())
    }
    private def arr(): JArr = {
      expect('['); skipWs()
      val b = Vector.newBuilder[Value]
      if (!eof && s.charAt(pos) == ']') { pos += 1; return JArr(b.result()) }
      var done = false
      while (!done) {
        b += value()
        skipWs()
        if (!eof && s.charAt(pos) == ',') pos += 1
        else { expect(']'); done = true }
      }
      JArr(b.result())
    }
    private def str(): String = {
      expect('"')
      val b = new StringBuilder
      while (s.charAt(pos) != '"') {
        s.charAt(pos) match {
          case '\\' =>
            pos += 1
            s.charAt(pos) match {
              case '"' => b.append('"'); case '\\' => b.append('\\')
              case '/' => b.append('/'); case 'b' => b.append('\b')
              case 'f' => b.append('\f'); case 'n' => b.append('\n')
              case 'r' => b.append('\r'); case 't' => b.append('\t')
              case 'u' =>
                b.append(Integer.parseInt(s.substring(pos + 1, pos + 5), 16).toChar)
                pos += 4
              case c => throw new IllegalArgumentException(s"bad escape \\$c at $pos")
            }
            pos += 1
          case c => b.append(c); pos += 1
        }
      }
      pos += 1
      b.toString
    }
    private def num(): JNum = {
      val start = pos
      while (!eof && "+-0123456789.eE".indexOf(s.charAt(pos)) >= 0) pos += 1
      JNum(java.lang.Double.parseDouble(s.substring(start, pos)))
    }
  }
}

/** Shared JDK-HTTP JSON POST plumbing for the API transports: one wire
  * skeleton (timeouts, fixed-length streaming, bearer auth, non-2xx →
  * IOException with a truncated error body) serving both the embeddings
  * ([[JsonHttpTransport]]) and chat ([[graft.llm.ChatHttpTransport]]) wires,
  * plus the reference's exponential-backoff retry loop (utils.py:366-369:
  * `sleep(base * 2^attempt)`), shared by every retrying caller.
  */
private[graft] object HttpWire {

  def postJson(
      endpoint: String, body: String, apiKey: Option[String],
      connectTimeoutMs: Int, readTimeoutMs: Int, what: String,
      extraHeaders: Seq[(String, String)] = Nil): String = {
    val conn = URI.create(endpoint).toURL.openConnection().asInstanceOf[HttpURLConnection]
    try {
      conn.setConnectTimeout(connectTimeoutMs)
      conn.setReadTimeout(readTimeoutMs)
      conn.setRequestMethod("POST")
      conn.setRequestProperty("Content-Type", "application/json")
      apiKey.foreach(k => conn.setRequestProperty("Authorization", s"Bearer $k"))
      extraHeaders.foreach { case (k, v) => conn.setRequestProperty(k, v) }
      conn.setDoOutput(true)
      val payload = body.getBytes(StandardCharsets.UTF_8)
      conn.setFixedLengthStreamingMode(payload.length)
      val os = conn.getOutputStream
      try os.write(payload) finally os.close()
      val code = conn.getResponseCode
      if (code < 200 || code >= 300)
        throw new java.io.IOException(
          s"$what endpoint returned HTTP $code: ${readAll(conn.getErrorStream).take(200)}")
      readAll(conn.getInputStream)
    } finally conn.disconnect()
  }

  private def readAll(in: InputStream): String = {
    if (in == null) return ""
    val buf = new ByteArrayOutputStream()
    try {
      val chunk = new Array[Byte](8192)
      var n = in.read(chunk)
      while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
    } finally in.close()
    new String(buf.toByteArray, StandardCharsets.UTF_8)
  }

  /** Run `thunk`, sleeping `baseMs * 2^attempt` between attempts and
    * surfacing the last error past `maxRetries`.
    */
  def withBackoff[T](maxRetries: Int, baseMs: Long)(thunk: () => T): T = {
    var attempt = 0
    while (true) {
      try return thunk()
      catch {
        case e: Exception =>
          if (attempt >= maxRetries) throw e
          Thread.sleep(baseMs * (1L << attempt))
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }
}

/** OpenAI-style embeddings wire client over plain JDK HTTP — the live
  * counterpart of the test fakes behind [[EmbeddingTransport]], completing the
  * reference's operational path (reference: src/linktransformer/utils.py:179-248
  * posts packed text batches and reads one vector per text). Request:
  * `{"model": ..., "input": [texts...]}`; response:
  * `{"data": [{"embedding": [floats...]} ...]}` in input order. Any non-2xx
  * status (429 rate limit, 5xx) throws, which [[HttpEmbedder]] turns into
  * exponential-backoff retries (utils.py:366-369). Auth via bearer `apiKey`
  * when provided.
  */
class JsonHttpTransport(
    endpoint: String,
    model: String,
    apiKey: Option[String] = None,
    connectTimeoutMs: Int = 10000,
    readTimeoutMs: Int = 60000) extends EmbeddingTransport {

  override def request(texts: Seq[String]): Seq[Array[Double]] = {
    val body = texts.map(t => "\"" + MiniJson.escape(Option(t).getOrElse("")) + "\"")
      .mkString(s"""{"model":"${MiniJson.escape(model)}","input":[""", ",", "]}")
    parseResponse(
      HttpWire.postJson(endpoint, body, apiKey, connectTimeoutMs, readTimeoutMs, "embedding"),
      texts.length)
  }

  private def parseResponse(s: String, expected: Int): Seq[Array[Double]] = {
    import MiniJson._
    val data = parse(s) match {
      case JObj(f) => f.get("data") match {
        case Some(JArr(items)) => items
        case _ => throw new IllegalArgumentException("response has no \"data\" array")
      }
      case _ => throw new IllegalArgumentException("response is not a JSON object")
    }
    require(data.length == expected,
      s"endpoint returned ${data.length} embeddings for $expected texts")
    data.map {
      case JObj(f) => f.get("embedding") match {
        case Some(JArr(nums)) => nums.map {
          case JNum(d) => d
          case v => throw new IllegalArgumentException(s"non-numeric embedding element: $v")
        }.toArray
        case _ => throw new IllegalArgumentException("data item has no \"embedding\" array")
      }
      case v => throw new IllegalArgumentException(s"data item is not an object: $v")
    }
  }
}

/** Gemini-wire embeddings client — the other half of the provider matrix
  * whose routing quirks [[graft.llm.Routing]] preserves. The reference's
  * gemini path is a PER-STRING request loop with task type
  * "retrieval_document" and model names normalized to a `models/` prefix
  * (reference: src/linktransformer/utils.py:28-65) — both preserved here
  * over the public `embedContent` REST wire. Request, one per text:
  * `{"model":"models/X","content":{"parts":[{"text":...}]},
  * "taskType":"retrieval_document"}`; response:
  * `{"embedding":{"values":[floats...]}}`. Auth via the `x-goog-api-key`
  * header (this wire's key carrier — not `Authorization: Bearer`). A
  * batch-level caller ([[HttpEmbedder]]) still packs texts per call; this
  * transport unrolls each pack into single-text requests, exactly like the
  * reference loop it mirrors.
  */
class GeminiHttpTransport(
    endpoint: String,
    model: String,
    apiKey: Option[String] = None,
    connectTimeoutMs: Int = 10000,
    readTimeoutMs: Int = 60000) extends EmbeddingTransport {

  // _normalize_gemini_model_name (utils.py:28-32)
  private val modelName = if (model.startsWith("models/")) model else s"models/$model"
  private val headers = apiKey.map(k => "x-goog-api-key" -> k).toSeq

  override def request(texts: Seq[String]): Seq[Array[Double]] = texts.map { t =>
    val body =
      s"""{"model":"${MiniJson.escape(modelName)}","content":{"parts":[{"text":"${
        MiniJson.escape(Option(t).getOrElse(""))}"}]},"taskType":"retrieval_document"}"""
    parseOne(HttpWire.postJson(
      endpoint, body, None, connectTimeoutMs, readTimeoutMs, "gemini embedding", headers))
  }

  private def parseOne(s: String): Array[Double] = {
    import MiniJson._
    parse(s) match {
      case JObj(f) => f.get("embedding") match {
        case Some(JObj(e)) => e.get("values") match {
          case Some(JArr(nums)) => nums.map {
            case JNum(d) => d
            case v => throw new IllegalArgumentException(s"non-numeric embedding element: $v")
          }.toArray
          case _ => throw new IllegalArgumentException("embedding has no \"values\" array")
        }
        // reference: `response["embedding"]` missing → error (utils.py:58-60)
        case _ => throw new IllegalArgumentException("Gemini embedding response missing \"embedding\"")
      }
      case _ => throw new IllegalArgumentException("response is not a JSON object")
    }
  }
}
