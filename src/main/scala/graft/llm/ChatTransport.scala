package graft.llm

import graft.embed.{HttpWire, MiniJson}

/** One chat turn on the wire: `{"role": ..., "content": ...}`. */
final case class ChatMessage(role: String, content: String)

/** A chat-completions round trip: messages in, assistant content out.
  *
  * This is the seam every LLM row operator plugs into: [[ChatPairJudge]],
  * [[ChatRowClassifier]], and [[ChatBatchTransformer]] adapt it to the
  * [[Llm.PairJudge]] / [[Llm.RowClassifier]] / [[Llm.BatchTransformer]]
  * traits, so the same operators run against a deterministic stub in tests
  * and a real endpoint in production. Implementations must be Serializable:
  * they ship inside `mapPartitions` closures and are invoked executor-side,
  * one instance per task (HTTP state is per-request, so sharing is safe).
  */
trait ChatTransport extends Serializable {
  def complete(messages: Seq[ChatMessage]): String
}

/** OpenAI-style chat-completions client over plain JDK HTTP — the chat twin
  * of [[graft.embed.JsonHttpTransport]], completing the reference's judge /
  * classify / transform operational path (reference:
  * src/linktransformer/utils.py:267-313 builds the messages+params request;
  * infer.py:1165-1177 is the judge call with these exact five sampling
  * params). Request:
  * `{"model":..., "messages":[...], "temperature":..., "max_tokens":...,
  * "top_p":..., "frequency_penalty":..., "presence_penalty":...}`;
  * response: `choices[0].message.content`. Any non-2xx throws
  * `IOException` — retry policy belongs to the wrapper/adapters
  * ([[RetryingChatTransport]]), mirroring how [[graft.embed.HttpEmbedder]]
  * owns retries around its transport.
  */
class ChatHttpTransport(
    endpoint: String,
    model: String,
    apiKey: Option[String] = None,
    temperature: Double = 0.0,
    maxTokens: Int = 50,
    topP: Double = 1.0,
    frequencyPenalty: Double = 0.0,
    presencePenalty: Double = 0.0,
    connectTimeoutMs: Int = 10000,
    readTimeoutMs: Int = 60000) extends ChatTransport {

  override def complete(messages: Seq[ChatMessage]): String = {
    val msgs = messages.map(m =>
      s"""{"role":"${MiniJson.escape(m.role)}","content":"${MiniJson.escape(m.content)}"}""")
      .mkString("[", ",", "]")
    val body =
      s"""{"model":"${MiniJson.escape(model)}","messages":$msgs,""" +
        s""""temperature":$temperature,"max_tokens":$maxTokens,"top_p":$topP,""" +
        s""""frequency_penalty":$frequencyPenalty,"presence_penalty":$presencePenalty}"""
    parseContent(
      HttpWire.postJson(endpoint, body, apiKey, connectTimeoutMs, readTimeoutMs, "chat"))
  }

  private def parseContent(s: String): String = {
    import MiniJson._
    parse(s) match {
      case JObj(f) => f.get("choices") match {
        case Some(JArr(choice +: _)) => choice match {
          case JObj(c) => c.get("message") match {
            case Some(JObj(m)) => m.get("content") match {
              case Some(JStr(content)) => content
              case Some(JNull) | None => "" // reference: `content or ""` (infer.py:1177)
              case v => throw new IllegalArgumentException(s"non-string content: $v")
            }
            case _ => throw new IllegalArgumentException("choice has no \"message\" object")
          }
          case v => throw new IllegalArgumentException(s"choice is not an object: $v")
        }
        case _ => throw new IllegalArgumentException("response has no non-empty \"choices\"")
      }
      case _ => throw new IllegalArgumentException("response is not a JSON object")
    }
  }
}

/** Gemini-wire chat client over the public `generateContent` REST shape —
  * the judge-side counterpart of [[graft.embed.GeminiHttpTransport]],
  * completing the provider matrix [[Routing.judgeProvider]] routes into.
  * Request: `{"contents":[{"role":"user"|"model","parts":[{"text":...}]}]}`
  * (the assistant role maps to this wire's "model"); response:
  * `candidates[0].content.parts[*].text` concatenated, empty when absent —
  * the reference's `getattr(response, "text", None) or ""`
  * (infer.py:1184-1186). Auth via `x-goog-api-key`, like the embeddings
  * wire. The reference sends its judge call as ONE flattened user prompt —
  * that shaping lives in [[GeminiPairJudge]], not here.
  */
class GeminiChatTransport(
    endpoint: String,
    apiKey: Option[String] = None,
    connectTimeoutMs: Int = 10000,
    readTimeoutMs: Int = 60000) extends ChatTransport {

  private val headers = apiKey.map(k => "x-goog-api-key" -> k).toSeq

  override def complete(messages: Seq[ChatMessage]): String = {
    val contents = messages.map { m =>
      val role = if (m.role == "assistant") "model" else "user"
      s"""{"role":"$role","parts":[{"text":"${MiniJson.escape(m.content)}"}]}"""
    }.mkString("[", ",", "]")
    parseText(graft.embed.HttpWire.postJson(
      endpoint, s"""{"contents":$contents}""", None,
      connectTimeoutMs, readTimeoutMs, "gemini chat", headers))
  }

  private def parseText(s: String): String = {
    import MiniJson._
    parse(s) match {
      case JObj(f) => f.get("candidates") match {
        case Some(JArr(cand +: _)) => cand match {
          case JObj(c) => c.get("content") match {
            case Some(JObj(content)) => content.get("parts") match {
              case Some(JArr(parts)) => parts.collect {
                case JObj(p) => p.get("text") match {
                  case Some(JStr(t)) => t
                  case _ => ""
                }
              }.mkString
              case _ => "" // no parts -> the reference's `or ""`
            }
            case _ => ""
          }
          case _ => ""
        }
        case _ => "" // blocked/empty candidates -> ""
      }
      case _ => throw new IllegalArgumentException("response is not a JSON object")
    }
  }
}

/** Exponential-backoff retry around any [[ChatTransport]]: sleep
  * `initialBackoffMs * 2^attempt` between attempts, surface the last error
  * past `maxRetries` — the reference's ratelimit loop verbatim
  * (utils.py:366-369: `time.sleep(ratelimit_sleep_time * (2 ** num_retry))`;
  * same policy in the judge loop, infer.py:1188-1191).
  */
class RetryingChatTransport(
    inner: ChatTransport,
    maxRetries: Int = 5,
    initialBackoffMs: Long = 15000L) extends ChatTransport {
  override def complete(messages: Seq[ChatMessage]): String =
    HttpWire.withBackoff(maxRetries, initialBackoffMs)(() => inner.complete(messages))
}

/** [[Llm.PairJudge]] over a chat endpoint: user content is the
  * `{"left": ..., "right": ...}` JSON the reference judge sends
  * (infer.py:1160: `json.dumps({"left": ..., "right": ...})` — payloads here
  * are the already-serialized key columns), system content is the judge
  * prompt. Returns the RAW assistant text; [[Llm.parseJudgeResponse]] owns
  * the permissive parse, exactly as the reference separates the call
  * (infer.py:1165) from `_coerce_llm_match_and_confidence` (infer.py:1194).
  * Wrap the transport in [[RetryingChatTransport]] for the reference's
  * retry-the-call-only semantics.
  */
class ChatPairJudge(transport: ChatTransport, systemPrompt: String) extends Llm.PairJudge {
  override def judge(leftPayload: String, rightPayload: String): String = {
    val user = s"""{"left":"${MiniJson.escape(leftPayload)}","right":"${MiniJson.escape(rightPayload)}"}"""
    transport.complete(Seq(ChatMessage("system", systemPrompt), ChatMessage("user", user)))
  }
}

/** The gemini judge SHAPE: where the openai path sends system+user chat
  * messages, the reference's gemini path flattens everything into one user
  * prompt with fixed glue text (infer.py:1180-1184:
  * `f"{llm_prompt}\n\nCompare the following pair payload and return JSON
  * only.\n{user_content}"`) — preserved verbatim so a prompt tuned against
  * the reference behaves identically here. Same raw-text-out contract as
  * [[ChatPairJudge]]; [[Llm.parseJudgeResponse]] owns the permissive parse.
  */
class GeminiPairJudge(transport: ChatTransport, systemPrompt: String) extends Llm.PairJudge {
  override def judge(leftPayload: String, rightPayload: String): String = {
    val user = s"""{"left":"${MiniJson.escape(leftPayload)}","right":"${MiniJson.escape(rightPayload)}"}"""
    val prompt = s"$systemPrompt\n\nCompare the following pair payload and return JSON only.\n$user"
    transport.complete(Seq(ChatMessage("user", prompt)))
  }
}

/** [[Llm.RowClassifier]] over a chat endpoint: one call per text with the
  * topic/system prompt, label decoded through `labelMap` (reference
  * predict_rows_with_openai, utils.py:316-381; default label_dict
  * `{"Yes": 1, "No": 0}`, utils.py:371). A response outside the map becomes
  * `unknownLabel` (-1) — the reference keeps raw text labels and warns
  * (utils.py:374-380), which an Int-typed column cannot represent; -1 is the
  * engine's explicit "unmapped" marker and is filterable downstream.
  */
class ChatRowClassifier(
    transport: ChatTransport,
    systemPrompt: String,
    labelMap: Map[String, Int] = Map("Yes" -> 1, "No" -> 0),
    unknownLabel: Int = -1) extends Llm.RowClassifier {
  override def classify(batch: Seq[String]): Seq[Int] = batch.map { text =>
    val raw = transport.complete(
      Seq(ChatMessage("system", systemPrompt), ChatMessage("user", text)))
    labelMap.getOrElse(raw.trim, unknownLabel)
  }
}

/** [[Llm.BatchTransformer]] over a chat endpoint: ships the whole chunk as a
  * JSON array with the reference's appended same-order/JSON-only instruction,
  * expects a JSON array of strings back, and retries (with the standard
  * backoff) on transport errors AND malformed/wrong-length replies — the
  * reference wraps parse+length-check inside its retry loop
  * (utils.py:434-465: json.loads + isinstance + length check all inside
  * `for attempt in range(retries)`), so a flaky model gets re-asked rather
  * than failing the stage.
  */
class ChatBatchTransformer(
    transport: ChatTransport,
    prompt: String,
    maxRetries: Int = 5,
    initialBackoffMs: Long = 15000L) extends Llm.BatchTransformer {

  override def transform(chunk: Seq[String]): Seq[String] = {
    val jsonInstr = "\n\nPlease return only a JSON array of strings, " +
      "one entry per input, in the same order, with no extra text."
    val user = chunk.map(t => "\"" + MiniJson.escape(Option(t).getOrElse("")) + "\"")
      .mkString("[", ",", "]")
    val messages = Seq(ChatMessage("system", prompt + jsonInstr), ChatMessage("user", user))
    // parse + length check sit INSIDE the retried thunk (utils.py:434-465) —
    // pass a raw transport here, not a RetryingChatTransport, or the two
    // loops multiply into maxRetries² calls per chunk
    HttpWire.withBackoff(maxRetries, initialBackoffMs) { () =>
      parseArray(transport.complete(messages), chunk.length)
    }
  }

  private def parseArray(raw: String, expected: Int): Seq[String] = {
    import MiniJson._
    parse(raw) match {
      case JArr(items) =>
        require(items.length == expected,
          s"transform endpoint returned ${items.length} items for $expected inputs")
        items.map {
          case JStr(s) => s
          case JNull => null
          case v => throw new IllegalArgumentException(s"non-string array element: $v")
        }
      case v => throw new IllegalArgumentException(s"expected a JSON array, got: $v")
    }
  }
}
