"""Real HTTP NLP providers (U1/U2/U4): executor-side fan-out over stdlib.

The reference talks to cTAKES / cNLP-transformers / LLM endpoints with
async httpx clients from one process (nlp/extract.py:16-66,
nlp/models.py:95-664, ctakesclient). Neither httpx nor aiohttp ship in
this environment, so the clients here use ``urllib.request`` plus a
thread pool — threads are ideal for I/O fan-out, and each Spark task
runs its own pool, so cluster-wide concurrency is
``tasks × concurrency`` without any shared state.

Providers implement two call shapes:

- ``__call__(text) -> list[match]`` — one note (the stub-model
  interface, so everything downstream is provider-agnostic);
- ``map_batch(texts) -> list[list[match]]`` — a whole Arrow batch,
  fanned out concurrently; ``run_model`` prefers this when present.

Transient failures (429/5xx, connection errors) retry with exponential
backoff inside the task; a note that still fails raises, failing only
that Spark task (the scheduler retries it), matching the reference's
per-request retry loop (nlp/utils.py + models.py error handling).
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field

RETRYABLE_STATUSES = frozenset({429, 500, 502, 503, 504})


def is_service_available(url: str, timeout: float = 2.0) -> bool:
    """Socket-level reachability probe, parity with the reference's
    pre-flight service watcher (nlp/watcher.py:18-43 +
    cli_utils.is_url_available): is something listening at the URL's
    host:port? A server that accepts the connection but is still
    warming up counts as available — it will block replies, not refuse
    them, exactly the reference's stance."""
    import socket
    import urllib.parse

    parsed = urllib.parse.urlparse(url)
    port = parsed.port or (443 if parsed.scheme == "https" else 80)
    try:
        with socket.create_connection((parsed.hostname, port), timeout=timeout):
            return True
    except OSError:
        return False


def wait_for_service(url: str, attempts: int = 5, delay: float = 1.0) -> None:
    """Block until the service is reachable, or raise with the
    reference's remediation hint (watcher.py:28-32)."""
    for i in range(attempts):
        if is_service_available(url):
            return
        if i < attempts - 1:
            time.sleep(delay)
    raise ConnectionError(
        f"No running NLP service was found at {url}. "
        "Check the URL or start the support services."
    )


@dataclass
class HttpClient:
    """Minimal JSON-over-HTTP client with retry/backoff.

    Stateless between calls, so one instance is safe to share across the
    threads of a task's pool (urllib opens a fresh connection per
    request; keep-alive is a future optimization, not a semantic)."""

    timeout: float = 300.0  # cTAKES can take ~20s/note; be generous (ref extract.py:12)
    max_retries: int = 3
    backoff: float = 0.5
    headers: dict = field(default_factory=dict)

    def post_json(self, url: str, payload: dict | str) -> dict:
        body = payload if isinstance(payload, str) else json.dumps(payload)
        return self._request(url, data=body.encode("utf-8"), method="POST")

    def get_json(self, url: str) -> dict:
        return self._request(url, data=None, method="GET")

    def delete(self, url: str) -> dict:
        return self._request(url, data=None, method="DELETE")

    def _request(self, url: str, data: bytes | None, method: str) -> dict:
        last_err: Exception | None = None
        retry_after: float | None = None
        for attempt in range(self.max_retries + 1):
            try:
                req = urllib.request.Request(
                    url,
                    data=data,
                    method=method,
                    headers={"Content-Type": "application/json", **self.headers},
                )
                with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                    body = resp.read().decode("utf-8")
                    return json.loads(body) if body.strip() else {}
            except urllib.error.HTTPError as err:
                if err.code not in RETRYABLE_STATUSES:
                    raise
                last_err = err
                # Honor Retry-After on 429/503 (delta-seconds form), the way
                # the reference's SDKs do — but never past the backoff cap.
                try:
                    retry_after = float(err.headers.get("Retry-After", ""))
                except (TypeError, ValueError):
                    retry_after = None
            except (urllib.error.URLError, TimeoutError, ConnectionError) as err:
                last_err = err
                retry_after = None
            if attempt < self.max_retries:
                delay = self.backoff * (2**attempt)
                if retry_after is not None:
                    delay = min(max(delay, retry_after), 30.0)
                time.sleep(delay)
        raise RuntimeError(f"{method} {url} failed after {self.max_retries + 1} tries") from last_err


def _fan_out(fn, items, concurrency: int) -> list:
    """Order-preserving concurrent map over one task's batch."""
    if concurrency <= 1 or len(items) <= 1:
        return [fn(x) for x in items]
    with ThreadPoolExecutor(max_workers=concurrency) as pool:
        return list(pool.map(fn, items))


@dataclass
class CtakesHttpModel:
    """U1/U2: cTAKES symptom extraction + optional cNLP negation check.

    POSTs raw note text to the cTAKES REST endpoint and normalizes the
    response into the MATCH_SCHEMA shape (text/code/polarity/begin/end).
    With ``cnlp_url`` set, match spans get a second opinion from a
    cnlp-transformers negation endpoint (``{"doc_text":…, "entities":
    [[begin,end],…]} → {"statuses": [-1|1,…]}``), mirroring the
    reference's two-stage extract (covid_ctakes.py:86-118,
    nlp/extract.py:38-66).

    Custom vocabulary (ref nlp/watcher.py:107-170): a study can attach
    its own BSV symptom dictionary via ``bsv_path`` + ``overrides_dir``
    — ``install_dictionary()`` converts it to cTAKES 4-column form and
    drops it into the overrides folder the server watches, and MUST run
    (the CLI runs it) before the first request so every extraction
    queries the study vocabulary, not the server default. Driver-side
    only: executors just POST text.
    """

    url: str
    cnlp_url: str | None = None
    concurrency: int = 8
    client: HttpClient = field(default_factory=HttpClient)
    bsv_path: str | None = None
    overrides_dir: str | None = None

    def install_dictionary(self, ready_check=None) -> bool:
        """Install the study BSV into the cTAKES overrides folder; no-op
        False (with a warning, never an error) when the model carries no
        custom dictionary or no overrides folder is configured."""
        if not self.bsv_path:
            return False
        from cumulus_etl_spark.nlp.ctakes_dict import install_ctakes_dictionary

        return install_ctakes_dictionary(
            self.overrides_dir, self.bsv_path, ready_check=ready_check
        )

    def __call__(self, text: str | None) -> list[dict]:
        if not text:
            return []
        raw = self.client.post_json(self.url, text)
        matches = [
            {
                "text": m.get("text"),
                "code": (m.get("conceptAttributes") or [{}])[0].get("cui", m.get("code")),
                "polarity": m.get("polarity", "positive"),
                "begin": m.get("begin"),
                "end": m.get("end"),
            }
            for m in raw.get("matches", raw if isinstance(raw, list) else [])
        ]
        if self.cnlp_url and matches:
            spans = [[m["begin"], m["end"]] for m in matches]
            verdict = self.client.post_json(
                self.cnlp_url, {"doc_text": text, "entities": spans}
            )
            for m, status in zip(matches, verdict.get("statuses", [])):
                m["polarity"] = "negated" if status == -1 else "positive"
        matches.sort(key=lambda m: (m["code"] or "", m["begin"] or 0))
        return matches

    def map_batch(self, texts: list[str | None]) -> list[list[dict]]:
        return _fan_out(self, texts, self.concurrency)


@dataclass
class LlmHttpModel:
    """U4 (sync path): chat-completions-style structured extraction.

    POSTs ``{model, messages, response_format}`` and expects the standard
    completion envelope; the message content must be JSON — a match list
    or an object-schema answer (the response-schema compile in
    nlp/response_schema.py builds the format object). Token usage comes
    from the response ``usage`` block (ref nlp/models.py:283-311).

    NOTE: ``nlp/dialects.py:DialectLlmModel`` over ``OpenAICompatDialect``
    is the generalized form (per-provider URLs/headers/parsing, thread-
    safe token stats). This class predates it and differs in two ways a
    unification must preserve: ``url`` here is the COMPLETE endpoint
    (not a base that gets ``/chat/completions`` appended), and
    ``usage()`` reads the raw response usage dict rather than stats
    deltas. Behavioral fixes must land in BOTH (cf. the dict-answer
    pass-through in __call__ and DialectLlmModel.unwrap).
    """

    url: str
    model_name: str
    system_prompt: str = "Extract symptom matches as a JSON list."
    # reference prompt template: %CLINICAL-NOTE% marks where the note goes
    # (etl/tasks/nlp_task.py user-prompt handling); None → raw note text
    user_prompt_template: str | None = None
    response_format: dict | None = None
    concurrency: int = 4
    client: HttpClient = field(default_factory=HttpClient)
    _last_usage: dict = field(default_factory=dict)

    def _prompt(self, text: str) -> dict:
        user = (
            self.user_prompt_template.replace("%CLINICAL-NOTE%", text)
            if self.user_prompt_template
            else text
        )
        payload = {
            "model": self.model_name,
            "messages": [
                {"role": "system", "content": self.system_prompt},
                {"role": "user", "content": user},
            ],
        }
        if self.response_format:
            payload["response_format"] = self.response_format
        return self.client.post_json(self.url, payload)

    def __call__(self, text: str | None) -> list | dict:
        if not text:
            return []
        resp = self._prompt(text)
        self._last_usage[text] = resp.get("usage") or {}
        content = resp["choices"][0]["message"]["content"]
        answer = json.loads(content)
        # Lists are match envelopes; dicts are structured-extraction
        # answers (object response schemas) and must pass through whole —
        # run_nlp_task parses them against the task's compiled schema.
        return answer if isinstance(answer, (list, dict)) else []

    def usage(self, text: str | None) -> tuple[int, int]:
        u = self._last_usage.get(text) or {}
        return u.get("prompt_tokens", 0), u.get("completion_tokens", 0)

    def map_batch(self, texts: list[str | None]) -> list[list[dict]]:
        return _fan_out(self, texts, self.concurrency)


class HttpBatchProvider:
    """U4 (batch path): a real batch-API client for nlp/batch_api.BatchRun.

    submit() uploads one chunk file's prompts as JSONL to ``POST
    {base}/batches`` (→ ``{"id": …}``); poll() GETs
    ``{base}/batches/{id}`` until ``status == "completed"``, then
    fetches ``{base}/batches/{id}/results`` (``{"results": [{checksum,
    result}, …]}``) and lands them as the results parquet. Mirrors the
    reference's OpenAI-batch lifecycle (nlp/models.py:313-450): upload →
    poll → download, with resume handled by BatchRun's metadata.

    Chunk files are ≤50k requests by construction (batch_api.py), so the
    driver-side JSONL staging is bounded the same way the reference's
    file uploads are.
    """

    def __init__(self, base_url: str, client: HttpClient | None = None):
        self.base_url = base_url.rstrip("/")
        self.client = client or HttpClient()

    def submit(self, prompts_path: str) -> str:
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        # Stream partitions through the driver one at a time instead of
        # collect()ing the whole chunk: peak driver memory is the JSONL
        # body itself (bounded by the 50k-request / 200 MB chunk contract,
        # ref nlp/models.py:208-210), never body + a full Row list.
        df = spark.read.parquet(prompts_path).select("checksum", "note_text")
        lines: list[str] = []
        for r in df.toLocalIterator(prefetchPartitions=True):
            lines.append(
                json.dumps({"checksum": r["checksum"], "note_text": r["note_text"]})
            )
        resp = self.client.post_json(f"{self.base_url}/batches", "\n".join(lines))
        return resp["id"]

    def poll(self, spark, batch_id: str, prompts_path: str, results_path: str) -> bool:
        status = self.client.get_json(f"{self.base_url}/batches/{batch_id}")
        if status.get("status") != "completed":
            return False
        delivered = self.client.get_json(f"{self.base_url}/batches/{batch_id}/results")
        rows = [(r["checksum"], r["result"]) for r in delivered["results"]]
        spark.createDataFrame(rows, "checksum string, result string").write.mode(
            "overwrite"
        ).parquet(results_path)
        return True
