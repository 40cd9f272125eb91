package graft.llm

/** Provider-routing rules — pure functions preserving the reference's observable
  * quirks (SURVEY §7.4 point 6). Zero-egress build: routing decides which
  * [[graft.embed.Embedder]] / judge implementation a name maps to; no network
  * client is constructed here.
  */
object Routing {

  /** Gemini name check (reference: src/linktransformer/utils.py:17-25).
    * Quirk preserved: `"text-embedding-004"` and `"embedding-001"` route to
    * gemini even though they contain "text-embedding".
    */
  def isGeminiModel(name: String): Boolean = {
    val n = Option(name).getOrElse("").toLowerCase
    n.contains("gemini") || n.contains("text-embedding-004") || n.contains("embedding-001")
  }

  /** OpenAI embedding-model name check (reference: infer.py:924-928). Must be
    * applied AFTER [[isGeminiModel]] — the reference checks gemini first
    * (utils.py:194), which is what makes the quirk above observable.
    */
  def isOpenAiEmbeddingModel(name: String): Boolean = {
    val n = Option(name).getOrElse("").toLowerCase
    n.contains("text-embedding") || n.contains("ada-002")
  }

  sealed trait Provider
  case object Gemini extends Provider
  case object OpenAi extends Provider
  case object Local extends Provider

  /** Embedding-provider resolution order per the reference's `infer_embeddings`
    * (utils.py:188-206): gemini name → gemini; openai name → openai; anything
    * else is a local (sentence-transformers there, Embedder impl here) model.
    */
  def embeddingProvider(modelName: String): Provider =
    if (isGeminiModel(modelName)) Gemini
    else if (isOpenAiEmbeddingModel(modelName)) OpenAi
    else Local

  /** Key-based auto-resolution for `model="auto"` (reference: infer.py:931-947):
    * explicit gemini key wins, then env GEMINI/GOOGLE key, then openai key;
    * no key at all is an error.
    */
  def resolveAutoProvider(
      openAiKey: Option[String],
      geminiKey: Option[String],
      env: Map[String, String] = Map.empty): Either[String, Provider] = {
    val envGemini = env.get("GEMINI_API_KEY").orElse(env.get("GOOGLE_API_KEY"))
    val envOpenAi = env.get("OPENAI_API_KEY")
    geminiKey.orElse(envGemini).map(_ => Gemini: Provider)
      .orElse(openAiKey.orElse(envOpenAi).map(_ => OpenAi: Provider))
      .toRight("No API key provided: set an explicit key or OPENAI_API_KEY / GEMINI_API_KEY")
  }

  /** Judge-provider auto-detect from the judge model name
    * (reference: infer.py:1035-1045): gemini-ish names → gemini, else openai.
    */
  def judgeProvider(judgeModelName: String): Provider =
    if (isGeminiModel(judgeModelName)) Gemini else OpenAi

  /** Retry schedule for API-backed providers (reference: utils.py:366-369 —
    * backoff 15s·2^attempt, max_retries=5). Pure: returns the wait in ms for
    * a given attempt, for the provider impls to consume.
    */
  def backoffMs(attempt: Int, baseMs: Long = 15000L): Long =
    baseMs * (1L << math.min(attempt, 20))
}
