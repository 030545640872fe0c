"""Per-provider LLM request dialects (ref nlp/models.py:95-664).

The reference speaks three wire dialects through one ``Provider``
interface: Azure OpenAI chat completions (models.py:452-460 +
OpenAIProvider:209-330), AWS Bedrock ``converse`` (BedrockProvider:
110-206), and a local vLLM OpenAI-compatible server (VllmProvider:
463-483).  The orchestration around them (caching, batching, span
re-anchoring, usage rollups) lives elsewhere in this package and is
provider-agnostic; this module pins only the *request/response shapes*:
exactly what JSON goes on the wire and exactly how the reply is parsed
back into a structured answer plus token counters.

Everything here is driver/executor-side plain Python over the stdlib
``HttpClient`` (this environment has no openai/boto3 SDK, and no
network — tests exercise the shapes against a local fake server).  AWS
SigV4 request signing is deliberately out of scope: ``BedrockConverse
Dialect`` accepts a pluggable ``authorize`` callable so a deployment
can attach its signer; the *payload* is what parity requires.

Dialects are deliberately tiny: ``request() -> (url, headers, payload)``
and ``parse(raw, stats) -> answer JSON`` with usage side-accounted into
a ``TokenStats``.  ``DialectLlmModel`` adapts any dialect to the
model-callable interface that ``run_model`` fans out over Spark tasks
(see http_provider.py).
"""

from __future__ import annotations

import json
import os
import threading
import urllib.parse
from dataclasses import dataclass, field

from cumulus_etl_spark.nlp.http_provider import HttpClient, _fan_out

# ---------------------------------------------------------------------------
# Token accounting (ref models.py:76-93 TokenStats / TokenPrices)
# ---------------------------------------------------------------------------


@dataclass
class TokenStats:
    """Cumulative token counters across calls (ref models.py:76-83)."""

    new_input_tokens: int = 0
    cache_read_input_tokens: int = 0
    cache_written_input_tokens: int = 0
    output_tokens: int = 0


@dataclass(kw_only=True)
class TokenPrices:
    """Dollars per 1,000 tokens (ref models.py:85-93); ``date`` records
    when the public price sheet was last read."""

    date: str
    new_input_tokens: float
    cache_read_input_tokens: float = 0.0
    cache_written_input_tokens: float = 0.0
    output_tokens: float = 0.0
    multiplier: float = 1.0

    def cost(self, stats: TokenStats) -> float:
        per_k = (
            stats.new_input_tokens * self.new_input_tokens
            + stats.cache_read_input_tokens * self.cache_read_input_tokens
            + stats.cache_written_input_tokens * self.cache_written_input_tokens
            + stats.output_tokens * self.output_tokens
        )
        return per_k / 1000.0 * self.multiplier


# ---------------------------------------------------------------------------
# Dialects
# ---------------------------------------------------------------------------


def openai_response_format(name: str, json_schema: dict, strict: bool = True) -> dict:
    """The chat-completions ``response_format`` wrapper for a JSON schema
    (ref models.py:240-259 pydantic_to_response_format)."""
    return {
        "type": "json_schema",
        "json_schema": {"schema": json_schema, "name": name, "strict": strict},
    }


class OpenAICompatDialect:
    """OpenAI-compatible chat completions: local vLLM or any ``/v1``
    server (ref VllmProvider models.py:463-483 + _prompt_args:261-277).

    Request pins: ``seed=12345`` and ``temperature=0`` for
    reproducibility, 120 s timeout, ``response_format`` either the
    strict json_schema wrapper or plain ``json_object`` when the server
    can't do schemas (ref models.py:262-265).
    """

    name = "local"

    def __init__(
        self,
        base_url: str,
        model_name: str,
        *,
        api_key: str | None = None,
        supports_schema: bool = True,
        deployment: str | None = None,
    ):
        self.base_url = base_url.rstrip("/")
        self.model_name = model_name
        self.api_key = api_key
        self.supports_schema = supports_schema
        # Azure routes by deployment name; plain OpenAI-compat uses the
        # model id for both (ref models.py:230 `deployment or model_name`).
        self.deployment = deployment or model_name

    # -- wire shape --------------------------------------------------------

    def _headers(self) -> dict:
        headers = {}
        if self.api_key:
            headers["Authorization"] = f"Bearer {self.api_key}"
        return headers

    def completions_url(self) -> str:
        return f"{self.base_url}/chat/completions"

    def models_url(self) -> str:
        return f"{self.base_url}/models"

    def request(
        self, system: str, user: str, response_format: dict | None
    ) -> tuple[str, dict, dict]:
        payload = {
            "model": self.deployment,
            "messages": [
                {"role": "system", "content": system},
                {"role": "user", "content": user},
            ],
            "seed": 12345,  # arbitrary; pinned for reproducibility (ref :271)
            "temperature": 0,
        }
        if response_format:
            # schema-less servers degrade to plain json_object mode (ref
            # models.py:262-265). With NO format requested, omit the key
            # entirely — json_object mode forces a top-level object, which
            # would make list-shaped answers (match envelopes) impossible.
            payload["response_format"] = (
                response_format
                if self.supports_schema
                else {"type": "json_object"}
            )
        return self.completions_url(), self._headers(), payload

    # -- parse -------------------------------------------------------------

    def parse(self, raw: dict, stats: TokenStats | None = None) -> dict | list:
        """Extract the structured answer; account usage (ref
        _process_completion_result models.py:279-311)."""
        usage = raw.get("usage") or {}
        if stats is not None:
            details = usage.get("prompt_tokens_details") or {}
            cached = details.get("cached_tokens") or 0
            stats.cache_read_input_tokens += cached
            stats.new_input_tokens += (usage.get("prompt_tokens") or 0) - cached
            stats.output_tokens += usage.get("completion_tokens") or 0

        choice = raw["choices"][0]
        if choice.get("finish_reason") not in (None, "stop"):
            raise ValueError(
                f"did not complete, with finish reason: {choice['finish_reason']}"
            )
        return json.loads(choice["message"]["content"])

    def fingerprint(self, raw: dict) -> str | None:
        return raw.get("system_fingerprint")

    # -- pre-flight --------------------------------------------------------

    def post_init_check(self, client: HttpClient) -> None:
        """GET /models and require our model id to be served (ref
        post_init_check models.py:233-245)."""
        try:
            listed = client.get_json(self.models_url())
        except Exception as exc:  # noqa: BLE001 - any transport error is fatal here
            raise ConnectionError(f"NLP server is unreachable: {exc}") from exc
        names = {m.get("id") for m in listed.get("data", [])}
        if self.model_name not in names:
            raise ValueError(
                f"NLP server does not have model ID '{self.model_name}'."
            )


class AzureOpenAIDialect(OpenAICompatDialect):
    """Azure OpenAI: deployment-scoped URL + ``api-key`` header +
    pinned ``api-version`` (ref AzureProvider models.py:452-460; the
    openai SDK's AsyncAzureOpenAI builds exactly this request).

    Env contract mirrors the reference (models.py:511-533):
    ``AZURE_OPENAI_API_KEY`` + ``AZURE_OPENAI_ENDPOINT`` must both be
    set; ``from_env`` raises otherwise.
    """

    name = "azure"
    API_VERSION = "2024-10-21"  # ref models.py:455
    ENV = ("AZURE_OPENAI_API_KEY", "AZURE_OPENAI_ENDPOINT")

    def __init__(self, endpoint: str, model_name: str, *, api_key: str,
                 deployment: str | None = None, supports_schema: bool = True):
        super().__init__(
            endpoint,
            model_name,
            api_key=api_key,
            supports_schema=supports_schema,
            deployment=deployment,
        )

    @classmethod
    def from_env(cls, model_name: str, *, deployment: str | None = None,
                 supports_schema: bool = True, env: dict | None = None
                 ) -> "AzureOpenAIDialect":
        env = os.environ if env is None else env
        if not all(env.get(k) for k in cls.ENV):
            raise ValueError(
                "Missing Azure environment variables. "
                "Set both AZURE_OPENAI_API_KEY & AZURE_OPENAI_ENDPOINT."
            )
        return cls(
            env["AZURE_OPENAI_ENDPOINT"],
            model_name,
            api_key=env["AZURE_OPENAI_API_KEY"],
            deployment=deployment,
            supports_schema=supports_schema,
        )

    def _headers(self) -> dict:
        return {"api-key": self.api_key}

    def completions_url(self) -> str:
        return (
            f"{self.base_url}/openai/deployments/"
            f"{urllib.parse.quote(self.deployment, safe='')}"
            f"/chat/completions?api-version={self.API_VERSION}"
        )

    def models_url(self) -> str:
        return f"{self.base_url}/openai/models?api-version={self.API_VERSION}"


class BedrockConverseDialect:
    """AWS Bedrock runtime ``Converse`` REST call (ref BedrockProvider
    models.py:110-206; wire shape is the public bedrock-runtime
    ``POST /model/{modelId}/converse`` API that boto3's
    ``client.converse`` issues).

    Schema handling follows the reference exactly: when the model
    supports it, a single ``to_json`` tool with the JSON schema as its
    input schema, forced via ``toolChoice`` (models.py:127-151); prompt
    caching adds ``cachePoint`` blocks to the system prompt and tool
    list (models.py:152-157).  Parsing tolerates both reply styles —
    a ``toolUse`` block (possibly wrapped in a single ``parameter`` /
    ``$PARAMETER_NAME`` field, models.py:180-188) or a text block whose
    JSON may be inside a markdown fence (models.py:190-199).

    ``authorize`` is an optional ``(url, body_bytes) -> headers`` hook
    for SigV4; this environment has no AWS SDK or network, so auth is a
    deployment concern, not a parity one.
    """

    name = "bedrock"

    def __init__(
        self,
        model_id: str,
        *,
        endpoint: str,
        supports_cache: bool = True,
        supports_schema: bool = True,
        authorize=None,
    ):
        self.model_id = model_id
        self.endpoint = endpoint.rstrip("/")
        self.supports_cache = supports_cache
        self.supports_schema = supports_schema
        self.authorize = authorize

    def completions_url(self) -> str:
        return (
            f"{self.endpoint}/model/"
            f"{urllib.parse.quote(self.model_id, safe='')}/converse"
        )

    def request(
        self, system: str, user: str, response_format: dict | None
    ) -> tuple[str, dict, dict]:
        payload: dict = {
            "system": [{"text": system}],
            "messages": [{"role": "user", "content": [{"text": user}]}],
            "inferenceConfig": {"temperature": 0},
        }
        if self.supports_cache:
            payload["system"].append({"cachePoint": {"type": "default"}})
        if response_format and self.supports_schema:
            # response_format arrives in the openai wrapper shape; Bedrock
            # wants the bare JSON schema inside a forced tool.
            schema = response_format.get("json_schema", {}).get("schema", response_format)
            tools: list = [
                {
                    "toolSpec": {
                        "name": "to_json",
                        "description": "convert to JSON",
                        "inputSchema": {"json": schema},
                    },
                },
            ]
            if self.supports_cache:
                tools.append({"cachePoint": {"type": "default"}})
            payload["toolConfig"] = {
                "tools": tools,
                "toolChoice": {"tool": {"name": "to_json"}},
            }
        headers = {}
        if self.authorize:
            url = self.completions_url()
            headers = self.authorize(url, json.dumps(payload).encode("utf-8"))
        return self.completions_url(), headers, payload

    def parse(self, raw: dict, stats: TokenStats | None = None) -> dict | list:
        usage = raw.get("usage") or {}
        if stats is not None:
            stats.cache_read_input_tokens += usage.get("cacheReadInputTokens", 0)
            stats.cache_written_input_tokens += usage.get("cacheWriteInputTokens", 0)
            stats.new_input_tokens += usage.get("inputTokens", 0)
            stats.output_tokens += usage.get("outputTokens", 0)

        stop_reason = raw.get("stopReason")
        if stop_reason not in {"end_turn", "tool_use"}:
            raise ValueError(f"did not complete, with stop reason: {stop_reason}")

        for content in raw["output"]["message"]["content"]:
            if "toolUse" in content:
                answer = content["toolUse"]["input"]
                # Some models wrap the answer in a single synthetic field
                # (ref models.py:180-188).
                if isinstance(answer, dict) and len(answer) == 1 and (
                    set(answer) & {"parameter", "$PARAMETER_NAME"}
                ):
                    answer = next(iter(answer.values()))
                return answer
            if "text" in content:
                text = content["text"]
                pieces = text.split("```")
                if len(pieces) == 3:  # JSON inside one markdown fence
                    text = pieces[1].removeprefix("json")
                return json.loads(text)
        raise ValueError("no response content found")

    def fingerprint(self, raw: dict) -> str | None:
        return None  # converse has no system_fingerprint equivalent

    def post_init_check(self, client: HttpClient) -> None:
        return None  # no cheap public list-models probe on bedrock-runtime


# ---------------------------------------------------------------------------
# Model registry (ref models.py:486-811) — public model ids + list prices
# ---------------------------------------------------------------------------


@dataclass(kw_only=True)
class ModelSpec:
    """One reference model's per-provider availability matrix
    (ref Model class fields, models.py:486-510)."""

    config_id: str
    azure_id: str | None = None
    azure_batches: bool = True
    azure_schema: bool = True
    azure_prices: TokenPrices | None = None
    bedrock_id: str | None = None
    bedrock_cache: bool = True
    bedrock_schema: bool = True
    bedrock_prices: TokenPrices | None = None
    vllm_model: str | None = None
    vllm_env_stem: str | None = None
    vllm_port: int | None = None

    def prices_for(self, provider: str) -> TokenPrices | None:
        return {"azure": self.azure_prices, "bedrock": self.bedrock_prices}.get(provider)


# Prices are the public Azure/AWS list prices the reference records
# (models.py:668-811), $/1k tokens, with their as-of dates.
MODEL_REGISTRY: dict[str, ModelSpec] = {
    spec.config_id: spec
    for spec in [
        ModelSpec(  # deprecated in the reference; kept for parity
            config_id="gpt35",
            azure_id="gpt-35-turbo-0125",
            azure_batches=False,
            azure_schema=False,
            azure_prices=TokenPrices(
                date="2025-10-15", new_input_tokens=0.00055, output_tokens=0.00165
            ),
        ),
        ModelSpec(
            config_id="gpt4",
            azure_id="gpt-4",
            azure_batches=False,
            azure_prices=TokenPrices(
                date="2025-10-15", new_input_tokens=0.06, output_tokens=0.12
            ),
        ),
        ModelSpec(
            config_id="gpt4o",
            azure_id="gpt-4o",
            azure_prices=TokenPrices(
                date="2025-10-15",
                new_input_tokens=0.0025,
                cache_read_input_tokens=0.00125,
                output_tokens=0.01,
            ),
        ),
        ModelSpec(
            config_id="gpt51",
            azure_id="gpt-5.1",
            azure_prices=TokenPrices(
                date="2026-05-07",
                new_input_tokens=0.00125,
                cache_read_input_tokens=0.00013,
                output_tokens=0.01,
            ),
        ),
        ModelSpec(
            config_id="gpt54",
            azure_id="gpt-5.4",
            azure_batches=False,
            azure_prices=TokenPrices(
                date="2026-05-07",
                new_input_tokens=0.0025,
                cache_read_input_tokens=0.00025,
                output_tokens=0.01,
            ),
        ),
        ModelSpec(
            config_id="gpt54mini",
            azure_id="gpt-5.4-mini",
            azure_batches=False,
            azure_prices=TokenPrices(
                date="2026-05-07",
                new_input_tokens=0.00075,
                cache_read_input_tokens=0.00008,
                output_tokens=0.0045,
            ),
        ),
        ModelSpec(
            config_id="gpt54nano",
            azure_id="gpt-5.4-nano",
            azure_batches=False,
            azure_prices=TokenPrices(
                date="2026-05-07",
                new_input_tokens=0.0002,
                cache_read_input_tokens=0.00002,
                output_tokens=0.00125,
            ),
        ),
        ModelSpec(
            config_id="gpt-oss-120b",
            azure_id="gpt-oss-120b",
            azure_batches=False,
            bedrock_id="openai.gpt-oss-120b-1:0",
            bedrock_cache=False,
            bedrock_prices=TokenPrices(
                date="2025-10-15", new_input_tokens=0.00015, output_tokens=0.0006
            ),
            vllm_model="openai/gpt-oss-120b",
            vllm_env_stem="GPT_OSS_120B",
            vllm_port=8086,
        ),
        ModelSpec(
            config_id="llama4-scout",
            azure_id="Llama-4-Scout-17B-16E-Instruct",
            azure_batches=False,
            bedrock_id="us.meta.llama4-scout-17b-instruct-v1:0",
            bedrock_cache=False,
            bedrock_schema=False,
            bedrock_prices=TokenPrices(
                date="2025-10-15", new_input_tokens=0.00017, output_tokens=0.00066
            ),
            vllm_model="nvidia/Llama-4-Scout-17B-16E-Instruct-FP4",
            vllm_env_stem="LLAMA4_SCOUT",
            vllm_port=8087,
        ),
        ModelSpec(
            config_id="claude-sonnet45",
            bedrock_id="us.anthropic.claude-sonnet-4-5-20250929-v1:0",
            bedrock_prices=TokenPrices(
                date="2025-10-15",
                new_input_tokens=0.0033,
                cache_read_input_tokens=0.00033,
                cache_written_input_tokens=0.004125,
                output_tokens=0.0165,
            ),
        ),
    ]
}


def make_dialect(
    provider: str,
    config_id: str,
    *,
    env: dict | None = None,
    deployment: str | None = None,
    bedrock_endpoint: str | None = None,
    authorize=None,
):
    """Provider selection mirroring the reference's ``Model.__init__``
    (models.py:528-558): validate the model supports the provider,
    validate env, build the dialect.

    Returns ``(dialect, prices)``.  ``provider`` ∈ {azure, bedrock,
    local}; anything else raises, as does a model/provider mismatch.
    """
    env = os.environ if env is None else env
    spec = MODEL_REGISTRY.get(config_id)
    if spec is None:
        raise ValueError(
            f"Unknown model '{config_id}'. Known: {sorted(MODEL_REGISTRY)}"
        )

    if provider == "azure":
        if not spec.azure_id:
            raise ValueError(f"{config_id} does not support the 'azure' provider.")
        dialect = AzureOpenAIDialect.from_env(
            spec.azure_id,
            deployment=deployment,
            supports_schema=spec.azure_schema,
            env=env,
        )
    elif provider == "bedrock":
        if not spec.bedrock_id:
            raise ValueError(f"{config_id} does not support the 'bedrock' provider.")
        endpoint = bedrock_endpoint or env.get("BEDROCK_ENDPOINT_URL")
        if not endpoint:
            raise ValueError(
                "Bedrock needs an endpoint URL (pass bedrock_endpoint or set "
                "BEDROCK_ENDPOINT_URL, e.g. the regional bedrock-runtime URL)."
            )
        dialect = BedrockConverseDialect(
            spec.bedrock_id,
            endpoint=endpoint,
            supports_cache=spec.bedrock_cache,
            supports_schema=spec.bedrock_schema,
            authorize=authorize,
        )
    elif provider == "local":
        if not spec.vllm_model:
            raise ValueError(f"{config_id} does not support the 'local' provider.")
        url = env.get(f"CUMULUS_{spec.vllm_env_stem}_URL")
        url = url or f"http://localhost:{spec.vllm_port}/v1"
        dialect = OpenAICompatDialect(url, spec.vllm_model, supports_schema=True)
    else:
        raise ValueError(f"Unknown provider '{provider}' (azure|bedrock|local).")

    return dialect, spec.prices_for(provider)


# ---------------------------------------------------------------------------
# Model-callable adapter
# ---------------------------------------------------------------------------


@dataclass
class DialectLlmModel:
    """Adapts any dialect to the callable interface ``run_model`` fans
    out over Spark tasks (same contract as LlmHttpModel): ``__call__
    (text) -> list[match]``, ``map_batch``, ``usage(text)``.

    Each Spark task builds its own instance (the model factory is
    pickled, not the stats), so token counters are per-task and roll up
    through the usage column exactly like LlmHttpModel's.
    """

    dialect: object
    system_prompt: str = "Extract symptom matches as a JSON list."
    user_prompt_template: str | None = None
    response_format: dict | None = None
    # Dict answers: pull this key out (match-list tasks whose object
    # schema wraps the list); None = return the dict as-is (boolean
    # struct tasks like the GPT covid study).
    unwrap: str | None = "matches"
    concurrency: int = 4
    client: HttpClient = field(default_factory=HttpClient)
    stats: TokenStats = field(default_factory=TokenStats)
    _last_usage: dict = field(default_factory=dict)
    _stats_lock: threading.Lock = field(default_factory=threading.Lock)

    def __call__(self, text: str | None) -> list[dict]:
        if not text:
            return []
        user = (
            self.user_prompt_template.replace("%CLINICAL-NOTE%", text)
            if self.user_prompt_template
            else text
        )
        url, headers, payload = self.dialect.request(
            self.system_prompt, user, self.response_format
        )
        raw = HttpClient(
            timeout=self.client.timeout,
            max_retries=self.client.max_retries,
            backoff=self.client.backoff,
            headers={**self.client.headers, **headers},
        ).post_json(url, payload)
        # Parse into a per-call stats object, then merge: map_batch runs
        # __call__ concurrently, so deltas off the shared counter would race.
        call_stats = TokenStats()
        answer = self.dialect.parse(raw, call_stats)
        with self._stats_lock:
            self.stats.new_input_tokens += call_stats.new_input_tokens
            self.stats.cache_read_input_tokens += call_stats.cache_read_input_tokens
            self.stats.cache_written_input_tokens += call_stats.cache_written_input_tokens
            self.stats.output_tokens += call_stats.output_tokens
        self._last_usage[text] = (
            call_stats.new_input_tokens + call_stats.cache_read_input_tokens,
            call_stats.output_tokens,
        )
        if isinstance(answer, dict) and self.unwrap is not None:
            return answer.get(self.unwrap, [])
        return answer

    def __getstate__(self):
        # run_model pickles the model into its mapInPandas closure; locks
        # don't pickle, and per-task counters must start fresh anyway.
        state = self.__dict__.copy()
        state["_stats_lock"] = None
        state["stats"] = TokenStats()
        state["_last_usage"] = {}
        return state

    def __setstate__(self, state):
        self.__dict__.update(state)
        self._stats_lock = threading.Lock()

    def usage(self, text: str | None) -> tuple[int, int]:
        return self._last_usage.get(text, (0, 0))

    def map_batch(self, texts: list[str | None]) -> list[list[dict]]:
        return _fan_out(self, texts, self.concurrency)
