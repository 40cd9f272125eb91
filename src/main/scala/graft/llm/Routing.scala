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

  /** `_resolve_knn_api_model` (reference: infer.py:931-947): an explicit
    * non-"auto" name wins; otherwise keys pick the provider's default model,
    * gemini before openai; no key at all is an error.
    */
  def resolveKnnApiModel(
      knnApiModel: Option[String],
      openAiKey: Option[String], geminiKey: Option[String],
      env: Map[String, String] = Map.empty): Either[String, String] =
    knnApiModel.filter(_ != "auto") match {
      case Some(explicit) => Right(explicit)
      case None =>
        if (geminiKey.orElse(env.get("GEMINI_API_KEY")).isDefined) Right("gemini-embedding-001")
        else if (openAiKey.orElse(env.get("OPENAI_API_KEY")).isDefined) Right("text-embedding-3-small")
        else Left("Could not resolve `knn_api_model`: provide `openai_key`/OPENAI_API_KEY or " +
          "`gemini_key`/GEMINI_API_KEY, or pass an explicit `knn_api_model`.")
    }

  /** Resolved retrieval config: model name plus the keys the retrieval stage
    * may use (a key is forwarded only when the model routes to its provider).
    */
  final case class RetrievalConfig(
      model: String, openAiKey: Option[String], geminiKey: Option[String])

  /** `_resolve_knn_retrieval_config` (reference: infer.py:950-977): sbert and
    * api retrieval models are mutually exclusive; an sbert model drops both
    * keys; an api model resolves via [[resolveKnnApiModel]] and forwards only
    * its provider's key; neither falls back to the judge-shared `model`.
    */
  def resolveKnnRetrievalConfig(
      model: String,
      knnSbertModel: Option[String], knnApiModel: Option[String],
      openAiKey: Option[String], geminiKey: Option[String],
      env: Map[String, String] = Map.empty): Either[String, RetrievalConfig] = {
    if (knnSbertModel.isDefined && knnApiModel.isDefined)
      return Left("Specify only one of `knn_sbert_model` or `knn_api_model`, not both.")
    // both predicates can match at once (the "text-embedding-004" quirk) and
    // the reference then forwards BOTH keys — preserved verbatim
    def keysFor(m: String) = RetrievalConfig(m,
      openAiKey.filter(_ => isOpenAiEmbeddingModel(m)),
      geminiKey.filter(_ => isGeminiModel(m)))
    knnSbertModel match {
      case Some(sbert) => Right(RetrievalConfig(sbert, None, None))
      case None => knnApiModel match {
        case Some(_) =>
          resolveKnnApiModel(knnApiModel, openAiKey, geminiKey, env).map(keysFor)
        case None => Right(keysFor(model)) // shared-default fallback (warns in reference)
      }
    }
  }

  /** Retry schedule for API-backed providers (reference: utils.py:366-369 —
    * backoff 15s·2^attempt, max_retries=5). Pure: returns the wait in ms for
    * a given attempt, for the provider impls to consume.
    */
  def backoffMs(attempt: Int, baseMs: Long = 15000L): Long =
    baseMs * (1L << math.min(attempt, 20))
}
