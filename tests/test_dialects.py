"""Provider wire-dialect parity (ref nlp/models.py:95-664).

Shape tests pin the exact request JSON each provider dialect emits
(Azure deployment URL + api-key header, Bedrock converse tool-forcing +
cachePoints, OpenAI-compat seed/temperature pins) and the tolerant
response parsing (toolUse wrapper unwrap, markdown-fenced JSON, cached
token accounting).  Round-trip tests run the dialects against a local
fake server, including through ``run_model``'s Spark fan-out.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from cumulus_etl_spark.nlp.dialects import (
    MODEL_REGISTRY,
    AzureOpenAIDialect,
    BedrockConverseDialect,
    DialectLlmModel,
    OpenAICompatDialect,
    TokenPrices,
    TokenStats,
    make_dialect,
    openai_response_format,
)
from cumulus_etl_spark.nlp.http_provider import HttpClient

SCHEMA = {
    "type": "object",
    "properties": {"matches": {"type": "array", "items": {"type": "string"}}},
}
FMT = openai_response_format("Matches", SCHEMA)


# ---------------------------------------------------------------------------
# Request shapes
# ---------------------------------------------------------------------------


def test_openai_compat_request_shape():
    d = OpenAICompatDialect("http://localhost:8086/v1/", "openai/gpt-oss-120b")
    url, headers, payload = d.request("sys", "user text", FMT)
    assert url == "http://localhost:8086/v1/chat/completions"
    assert headers == {}  # no key -> no auth header
    assert payload["model"] == "openai/gpt-oss-120b"
    assert payload["messages"] == [
        {"role": "system", "content": "sys"},
        {"role": "user", "content": "user text"},
    ]
    assert payload["seed"] == 12345 and payload["temperature"] == 0
    assert payload["response_format"]["type"] == "json_schema"
    assert payload["response_format"]["json_schema"]["strict"] is True
    assert payload["response_format"]["json_schema"]["schema"] == SCHEMA


def test_openai_compat_bearer_and_json_object_fallback():
    d = OpenAICompatDialect("http://x/v1", "m", api_key="sk-1", supports_schema=False)
    url, headers, payload = d.request("s", "u", FMT)
    assert headers == {"Authorization": "Bearer sk-1"}
    # schema-less servers get plain json_object mode (ref models.py:262-265)
    assert payload["response_format"] == {"type": "json_object"}


def test_openai_compat_no_format_means_no_key():
    # with NO response format requested, the key is omitted entirely —
    # json_object mode would forbid list-shaped (match envelope) answers
    d = OpenAICompatDialect("http://x/v1", "m")
    _, _, payload = d.request("s", "u", None)
    assert "response_format" not in payload
    d2 = OpenAICompatDialect("http://x/v1", "m", supports_schema=False)
    _, _, payload2 = d2.request("s", "u", None)
    assert "response_format" not in payload2


def test_azure_request_shape():
    d = AzureOpenAIDialect(
        "https://example.openai.azure.com",
        "gpt-4o",
        api_key="key-1",
        deployment="my deploy",
    )
    url, headers, payload = d.request("s", "u", FMT)
    # deployment-scoped path, URL-quoted, pinned api-version (ref :455)
    assert url == (
        "https://example.openai.azure.com/openai/deployments/my%20deploy"
        "/chat/completions?api-version=2024-10-21"
    )
    assert headers == {"api-key": "key-1"}
    assert payload["model"] == "my deploy"  # Azure routes by deployment


def test_azure_from_env_requires_both_vars():
    with pytest.raises(ValueError, match="AZURE_OPENAI_API_KEY"):
        AzureOpenAIDialect.from_env("gpt-4o", env={"AZURE_OPENAI_ENDPOINT": "https://x"})
    d = AzureOpenAIDialect.from_env(
        "gpt-4o",
        env={"AZURE_OPENAI_API_KEY": "k", "AZURE_OPENAI_ENDPOINT": "https://x"},
    )
    assert d.api_key == "k" and d.base_url == "https://x"


def test_bedrock_request_shape_full():
    d = BedrockConverseDialect(
        "us.anthropic.claude-sonnet-4-5-20250929-v1:0",
        endpoint="http://bedrock.local",
    )
    url, headers, payload = d.request("sys", "note", FMT)
    # model id colons are path-quoted in the converse URL
    assert url == (
        "http://bedrock.local/model/"
        "us.anthropic.claude-sonnet-4-5-20250929-v1%3A0/converse"
    )
    # cache points on system prompt AND tool list (ref models.py:152-157)
    assert payload["system"] == [
        {"text": "sys"},
        {"cachePoint": {"type": "default"}},
    ]
    assert payload["messages"] == [{"role": "user", "content": [{"text": "note"}]}]
    assert payload["inferenceConfig"] == {"temperature": 0}
    tools = payload["toolConfig"]["tools"]
    assert tools[0]["toolSpec"]["name"] == "to_json"
    assert tools[0]["toolSpec"]["inputSchema"] == {"json": SCHEMA}
    assert tools[1] == {"cachePoint": {"type": "default"}}
    assert payload["toolConfig"]["toolChoice"] == {"tool": {"name": "to_json"}}


def test_bedrock_request_shape_no_schema_no_cache():
    # llama4-scout on bedrock: no toolConfig at all (ref models.py:135-137),
    # no cachePoints
    d = BedrockConverseDialect(
        "us.meta.llama4-scout-17b-instruct-v1:0",
        endpoint="http://b",
        supports_cache=False,
        supports_schema=False,
    )
    _, _, payload = d.request("s", "u", FMT)
    assert "toolConfig" not in payload
    assert payload["system"] == [{"text": "s"}]


def test_bedrock_authorize_hook_sees_url_and_body():
    seen = {}

    def signer(url, body):
        seen["url"] = url
        seen["body"] = json.loads(body)
        return {"Authorization": "AWS4-HMAC-SHA256 ..."}

    d = BedrockConverseDialect("m-1", endpoint="http://b", authorize=signer)
    url, headers, payload = d.request("s", "u", None)
    assert headers == {"Authorization": "AWS4-HMAC-SHA256 ..."}
    assert seen["url"] == url and seen["body"] == payload


# ---------------------------------------------------------------------------
# Response parsing
# ---------------------------------------------------------------------------


def test_openai_parse_usage_and_content():
    d = OpenAICompatDialect("http://x/v1", "m")
    stats = TokenStats()
    raw = {
        "choices": [
            {"finish_reason": "stop", "message": {"content": '["a", "b"]'}}
        ],
        "usage": {
            "prompt_tokens": 100,
            "completion_tokens": 7,
            "prompt_tokens_details": {"cached_tokens": 60},
        },
        "system_fingerprint": "fp_1",
    }
    assert d.parse(raw, stats) == ["a", "b"]
    # cached tokens split out of prompt tokens (ref models.py:282-288)
    assert stats.new_input_tokens == 40
    assert stats.cache_read_input_tokens == 60
    assert stats.output_tokens == 7
    assert d.fingerprint(raw) == "fp_1"


def test_openai_parse_bad_finish_reason():
    d = OpenAICompatDialect("http://x/v1", "m")
    raw = {"choices": [{"finish_reason": "length", "message": {"content": "[]"}}]}
    with pytest.raises(ValueError, match="finish reason: length"):
        d.parse(raw, TokenStats())


def _bedrock_reply(content_blocks, stop="tool_use"):
    return {
        "stopReason": stop,
        "output": {"message": {"content": content_blocks}},
        "usage": {
            "inputTokens": 10,
            "outputTokens": 3,
            "cacheReadInputTokens": 5,
            "cacheWriteInputTokens": 2,
        },
    }


def test_bedrock_parse_tooluse_and_usage():
    d = BedrockConverseDialect("m", endpoint="http://b")
    stats = TokenStats()
    raw = _bedrock_reply([{"toolUse": {"input": {"matches": ["x"]}}}])
    assert d.parse(raw, stats) == {"matches": ["x"]}
    assert (stats.new_input_tokens, stats.output_tokens) == (10, 3)
    assert (stats.cache_read_input_tokens, stats.cache_written_input_tokens) == (5, 2)


@pytest.mark.parametrize("wrapper", ["parameter", "$PARAMETER_NAME"])
def test_bedrock_parse_unwraps_single_wrapper_field(wrapper):
    # some models wrap the answer in one synthetic field (ref :180-188)
    d = BedrockConverseDialect("m", endpoint="http://b")
    raw = _bedrock_reply([{"toolUse": {"input": {wrapper: {"matches": []}}}}])
    assert d.parse(raw) == {"matches": []}


def test_bedrock_parse_keeps_real_single_field():
    # a study whose schema has ONE top-level field that isn't a known
    # wrapper name must come through intact
    d = BedrockConverseDialect("m", endpoint="http://b")
    raw = _bedrock_reply([{"toolUse": {"input": {"matches": ["y"]}}}])
    assert d.parse(raw) == {"matches": ["y"]}


def test_bedrock_parse_text_with_markdown_fence():
    # reasoning models answer in text with a ```json fence (ref :190-199)
    d = BedrockConverseDialect("m", endpoint="http://b")
    raw = _bedrock_reply(
        [
            {"reasoningContent": {"text": "thinking..."}},
            {"text": 'Here you go:\n```json\n{"matches": ["z"]}\n```'},
        ],
        stop="end_turn",
    )
    assert d.parse(raw) == {"matches": ["z"]}


def test_bedrock_parse_bad_stop_and_empty_content():
    d = BedrockConverseDialect("m", endpoint="http://b")
    with pytest.raises(ValueError, match="stop reason: max_tokens"):
        d.parse(_bedrock_reply([], stop="max_tokens"))
    with pytest.raises(ValueError, match="no response content"):
        d.parse(_bedrock_reply([{"reasoningContent": {}}]))


# ---------------------------------------------------------------------------
# Registry + selection
# ---------------------------------------------------------------------------


def test_registry_matches_reference_matrix():
    # spot-pin the availability matrix (ref models.py:668-811)
    assert MODEL_REGISTRY["gpt35"].azure_schema is False
    assert MODEL_REGISTRY["gpt35"].azure_batches is False
    assert MODEL_REGISTRY["gpt4o"].azure_batches is True
    assert MODEL_REGISTRY["claude-sonnet45"].azure_id is None
    assert MODEL_REGISTRY["llama4-scout"].bedrock_schema is False
    assert MODEL_REGISTRY["gpt-oss-120b"].bedrock_cache is False
    assert MODEL_REGISTRY["gpt-oss-120b"].vllm_port == 8086


def test_make_dialect_selection_and_errors():
    env = {"AZURE_OPENAI_API_KEY": "k", "AZURE_OPENAI_ENDPOINT": "https://a"}
    d, prices = make_dialect("azure", "gpt4o", env=env, deployment="dep1")
    assert isinstance(d, AzureOpenAIDialect) and d.deployment == "dep1"
    assert prices.new_input_tokens == 0.0025

    with pytest.raises(ValueError, match="does not support the 'azure'"):
        make_dialect("azure", "claude-sonnet45", env=env)
    with pytest.raises(ValueError, match="Missing Azure environment"):
        make_dialect("azure", "gpt4o", env={})
    with pytest.raises(ValueError, match="Unknown model"):
        make_dialect("local", "nope", env={})
    with pytest.raises(ValueError, match="Unknown provider"):
        make_dialect("no-such-provider", "gpt4o", env=env)

    d, prices = make_dialect(
        "bedrock", "llama4-scout", env={"BEDROCK_ENDPOINT_URL": "http://b"}
    )
    assert isinstance(d, BedrockConverseDialect)
    assert d.supports_schema is False and d.supports_cache is False
    assert prices.output_tokens == 0.00066

    # local: env URL override beats the port default (ref models.py:465-466)
    d, prices = make_dialect(
        "local", "gpt-oss-120b", env={"CUMULUS_GPT_OSS_120B_URL": "http://e:9/v1"}
    )
    assert d.base_url == "http://e:9/v1" and prices is None
    d, _ = make_dialect("local", "llama4-scout", env={})
    assert d.base_url == "http://localhost:8087/v1"


def test_token_prices_cost_and_batch_multiplier():
    prices = TokenPrices(
        date="2026-05-07",
        new_input_tokens=0.001,
        cache_read_input_tokens=0.0001,
        output_tokens=0.01,
    )
    stats = TokenStats(
        new_input_tokens=2000, cache_read_input_tokens=10000, output_tokens=500
    )
    assert prices.cost(stats) == pytest.approx(0.002 + 0.001 + 0.005)
    prices.multiplier = 0.5  # batch mode halves both clouds (ref :565-567)
    assert prices.cost(stats) == pytest.approx(0.004)


# ---------------------------------------------------------------------------
# Fake-server round trips
# ---------------------------------------------------------------------------


def _matches(text: str) -> list[dict]:
    """Task-shaped match dicts, so the same fake server also backs the
    CLI end-to-end run (same contract as the stub covid model)."""
    out = []
    lower = (text or "").lower()
    for term in ("cough", "fever"):
        idx = lower.find(term)
        if idx != -1:
            out.append(
                {
                    "text": term,
                    "code": f"C-{term}",
                    "polarity": "positive",
                    "begin": idx,
                    "end": idx + len(term),
                }
            )
    return out


class _Handler(BaseHTTPRequestHandler):
    def log_message(self, *args):
        pass

    def _json(self, obj, code=200, headers=()):
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        for k, v in headers:
            self.send_header(k, v)
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if "models" in self.path:
            self._json(
                {"data": [{"id": "served-model"}, {"id": "openai/gpt-oss-120b"}]}
            )
        else:
            self.send_error(404)

    def do_POST(self):
        state = self.server.state
        body = self.rfile.read(int(self.headers.get("Content-Length", 0))).decode()
        req = json.loads(body)
        state["requests"].append(
            {"path": self.path, "body": req, "headers": dict(self.headers)}
        )
        if state["rate_limit_next"] > 0:
            state["rate_limit_next"] -= 1
            self._json({"error": "slow down"}, code=429, headers=[("Retry-After", "0")])
            return
        if "/chat/completions" in self.path:
            text = req["messages"][-1]["content"]
            fmt_name = (
                req.get("response_format", {}).get("json_schema", {}).get("name")
            )
            fmt_props = (
                req.get("response_format", {})
                .get("json_schema", {})
                .get("schema", {})
                .get("properties", {})
            )
            if fmt_name == "CovidSymptoms":
                from cumulus_etl_spark.nlp.studies import StubCovidBooleanModel

                # scan only the note body, not the instruction text that
                # itself names every symptom (a real LLM reads instructions;
                # a keyword stub must not)
                note = text.split("### Text ###")[-1]
                content = json.dumps(StubCovidBooleanModel()(note))
            elif set(fmt_props) == {"age"}:
                # object-schema TOML task: answer the schema's shape
                content = json.dumps({"age": len(text.split())})
            else:
                content = json.dumps(_matches(text))
            self._json(
                {
                    "choices": [
                        {
                            "finish_reason": "stop",
                            "message": {"content": content},
                        }
                    ],
                    "usage": {"prompt_tokens": 11, "completion_tokens": 4},
                    "system_fingerprint": "fp_fake",
                }
            )
        elif self.path.endswith("/converse"):
            text = req["messages"][0]["content"][0]["text"]
            self._json(
                {
                    "stopReason": "tool_use",
                    "output": {
                        "message": {
                            "content": [
                                {"toolUse": {"input": {"matches": _matches(text)}}}
                            ]
                        }
                    },
                    "usage": {"inputTokens": 9, "outputTokens": 2},
                }
            )
        else:
            self.send_error(404)


@pytest.fixture(scope="module")
def dialect_server():
    server = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    server.state = {"requests": [], "rate_limit_next": 0}
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield server
    server.shutdown()


def _base(server) -> str:
    return f"http://127.0.0.1:{server.server_address[1]}"


def test_openai_compat_round_trip_and_preflight(dialect_server):
    d = OpenAICompatDialect(f"{_base(dialect_server)}/v1", "served-model")
    d.post_init_check(HttpClient())  # model is listed -> ok
    model = DialectLlmModel(dialect=d, response_format=FMT)
    assert [m["text"] for m in model("patient has a cough")] == ["cough"]
    assert model.usage("patient has a cough") == (11, 4)
    assert model.stats.output_tokens == 4

    missing = OpenAICompatDialect(f"{_base(dialect_server)}/v1", "other-model")
    with pytest.raises(ValueError, match="does not have model ID"):
        missing.post_init_check(HttpClient())


def test_azure_round_trip_sends_api_key(dialect_server):
    d = AzureOpenAIDialect(
        _base(dialect_server), "gpt-4o", api_key="key-9", deployment="dep"
    )
    model = DialectLlmModel(dialect=d, response_format=FMT)
    assert [m["text"] for m in model("fever and cough")] == ["cough", "fever"]
    sent = dialect_server.state["requests"][-1]
    assert sent["path"].startswith("/openai/deployments/dep/chat/completions")
    assert sent["headers"].get("Api-Key") == "key-9"  # urllib title-cases headers
    assert sent["body"]["seed"] == 12345


def test_bedrock_round_trip(dialect_server):
    d = BedrockConverseDialect(
        "us.test.model-v1:0", endpoint=_base(dialect_server)
    )
    model = DialectLlmModel(dialect=d, response_format=FMT)
    assert [m["text"] for m in model("some fever here")] == ["fever"]
    assert model.stats.new_input_tokens == 9
    sent = dialect_server.state["requests"][-1]
    assert sent["path"] == "/model/us.test.model-v1%3A0/converse"
    assert sent["body"]["toolConfig"]["toolChoice"] == {"tool": {"name": "to_json"}}


def test_retry_after_is_honored(dialect_server):
    dialect_server.state["rate_limit_next"] = 2
    d = OpenAICompatDialect(f"{_base(dialect_server)}/v1", "served-model")
    model = DialectLlmModel(dialect=d, response_format=FMT)
    n_before = len(dialect_server.state["requests"])
    out = model("a cough")  # 2x 429 then success
    assert [m["text"] for m in out] == ["cough"]
    assert len(dialect_server.state["requests"]) == n_before + 3


def test_run_model_spark_fanout_with_dialect(spark, dialect_server):
    from cumulus_etl_spark.nlp.provider import run_model

    d = BedrockConverseDialect("m-x", endpoint=_base(dialect_server))
    model = DialectLlmModel(dialect=d, response_format=FMT)  # pickled to tasks
    notes = spark.createDataFrame(
        [("n1", "severe cough today"), ("n2", "no complaints")],
        "note_id string, note_text string",
    ).repartition(2)
    scored = run_model(notes, model).collect()
    by_id = {r["note_id"]: json.loads(r["result"]) for r in scored}
    assert [m["text"] for m in by_id["n1"]] == ["cough"]
    assert by_id["n2"] == []


def test_nlp_cli_end_to_end_with_local_provider(
    spark, dialect_server, tmp_path, capsys, monkeypatch
):
    """nlp verb with --provider local --model gpt-oss-120b: URL resolved
    from the reference's CUMULUS_*_URL env contract (models.py:465-466),
    pre-flight checks the served model list, extraction fans out through
    the OpenAI-compat dialect."""
    from cumulus_etl_spark.cli import main as cli_main
    from cumulus_etl_spark.sinks import ManagedTable
    from tests.fhir_fixtures import write_ndjson
    from tests.test_nlp import docref

    monkeypatch.setenv("CUMULUS_GPT_OSS_120B_URL", f"{_base(dialect_server)}/v1")
    in_dir = str(tmp_path / "in")
    out = str(tmp_path / "out")
    phi = str(tmp_path / "phi")
    ed_type = {"coding": [{"system": "http://loinc.org", "code": "34111-5"}]}
    docs = [docref("n1", text="bad cough today"), docref("n2", text="all clear")]
    for d in docs:
        d["type"] = ed_type
    write_ndjson(in_dir, "docs.ndjson", docs)

    rc = cli_main(
        ["nlp", in_dir, out, phi, "--provider", "local", "--model", "gpt-oss-120b"]
    )
    assert rc == 0
    summary = json.loads(capsys.readouterr().out)
    assert summary["covid_symptom__nlp_results"]["model_called"] == 2
    rows = ManagedTable(spark, out, "covid_symptom__nlp_results").read().collect()
    found = {r["match"]["text"] for r in rows if r["match"] is not None}
    assert found == {"cough"}

    # the GPT covid variant ran alongside (ref covid study default task
    # set) with its boolean-struct envelope: one typed row per note
    assert summary["covid_symptom__nlp_results_gpt_oss_120b"]["model_called"] == 2
    grows = ManagedTable(
        spark, out, "covid_symptom__nlp_results_gpt_oss_120b"
    ).read().collect()
    assert len(grows) == 2
    coughs = sorted(r["symptoms"]["Cough"] for r in grows)
    assert coughs == [False, True]
    assert all(r["symptoms"]["Diarrhea"] is False for r in grows)
    assert all(r["id"] == r["note_ref"].split("/")[1] for r in grows)


def test_toml_tasks_built_on_dialect_keep_their_prompts(
    spark, dialect_server, tmp_path, capsys, monkeypatch
):
    """--provider + --task-config: every TOML task's model must be
    dialect-backed AND keep the study's own prompts/response format
    (review finding: the generic provider model used to stomp them).
    End-to-end, the object-schema answer lands as a typed struct row."""
    import json as _json

    from cumulus_etl_spark.cli import main as cli_main
    from cumulus_etl_spark.nlp.dialects import DialectLlmModel, OpenAICompatDialect
    from cumulus_etl_spark.nlp.studies import load_study_tasks
    from cumulus_etl_spark.sinks import ManagedTable
    from tests.fhir_fixtures import write_ndjson
    from tests.test_nlp import docref

    study = tmp_path / "my_study"
    study.mkdir()
    (study / "age.json").write_text(
        _json.dumps({"type": "object", "properties": {"age": {"type": "integer"}}})
    )
    (study / "tasks.toml").write_text(
        '[shared]\nsystem-prompt = "Extract.\\n%JSON-SCHEMA%"\n'
        'user-prompt = "Doc:\\n%CLINICAL-NOTE%"\nmodels = ["gpt-4o"]\n\n'
        '[[task]]\nname = "age"\nversion = 2\nresponse-schema = "age.json"\n'
    )
    d = OpenAICompatDialect(f"{_base(dialect_server)}/v1", "served-model")
    tasks = load_study_tasks(str(study / "tasks.toml"), dialect=d)
    assert len(tasks) == 1
    m = tasks[0].model
    assert isinstance(m, DialectLlmModel) and m.dialect is d
    assert m.system_prompt.startswith("Extract.")  # study prompt kept
    assert '"age"' in m.system_prompt  # %JSON-SCHEMA% substituted
    assert m.unwrap is None  # object answers pass through whole
    assert m.response_format["json_schema"]["schema"]["properties"]["age"]

    # e2e through the CLI: dialect resolved first, TOML models built on it
    monkeypatch.setenv("CUMULUS_GPT_OSS_120B_URL", f"{_base(dialect_server)}/v1")
    in_dir = str(tmp_path / "in")
    write_ndjson(in_dir, "docs.ndjson", [docref("n1", text="four tokens right here")])
    rc = cli_main([
        "nlp", in_dir, str(tmp_path / "out"), str(tmp_path / "phi"),
        "--task-config", str(study / "tasks.toml"),
        "--provider", "local", "--model", "gpt-oss-120b",
    ])
    assert rc == 0
    capsys.readouterr()
    rows = ManagedTable(
        spark, str(tmp_path / "out"), "my_study__nlp_age_gpt_4o"
    ).read().collect()
    assert len(rows) == 1
    # struct parsed against the compiled schema; fake server answers
    # {"age": token count of the full templated prompt}
    assert rows[0]["result"]["age"] > 0


def test_covid_gpt_task_offline_stub(spark, tmp_path, capsys):
    """covid_gpt_task with the deterministic keyword stub: struct
    envelope lands without any HTTP model (offline parity of ref
    covid_tasks.py:244-329)."""
    from cumulus_etl_spark.nlp.studies import covid_gpt_task
    from cumulus_etl_spark.sinks import ManagedTable
    from tests.fhir_fixtures import write_ndjson
    from tests.test_nlp import docref

    in_dir = str(tmp_path / "in")
    ed_type = {"coding": [{"system": "http://loinc.org", "code": "34111-5"}]}
    docs = [
        docref("n1", text="fever, myalgia and a dry cough"),
        docref("n2", text="ankle sprain"),
    ]
    for d in docs:
        d["type"] = ed_type
    write_ndjson(in_dir, "docs.ndjson", docs)

    from cumulus_etl_spark.sources import scan_resources

    task = covid_gpt_task(model_id="gpt4")
    assert task.name == "covid_symptom__nlp_results_gpt4"
    assert task.task_version == 3
    docrefs = scan_resources(spark, in_dir, ["DocumentReference"])
    summary = task.run(
        spark, docrefs, str(tmp_path / "out"), str(tmp_path / "phi"), "2026-01-01"
    )
    assert summary["model_called"] == 2
    rows = ManagedTable(
        spark, str(tmp_path / "out"), "covid_symptom__nlp_results_gpt4"
    ).read().collect()
    assert len(rows) == 2
    by_fever = {r["symptoms"]["Fever or chills"]: r for r in rows}
    assert by_fever[True]["symptoms"]["Muscle or body aches"] is True
    assert by_fever[True]["symptoms"]["Sore throat"] is False
    assert by_fever[False]["symptoms"]["Cough"] is False
    # every field present and boolean-typed (schema-compiled struct)
    from cumulus_etl_spark.nlp.studies import COVID_SYMPTOM_FIELDS

    assert set(rows[0]["symptoms"].asDict()) == set(COVID_SYMPTOM_FIELDS)
