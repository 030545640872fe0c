"""Label Studio push for chart review (parity:
cumulus_etl/upload_notes/labelstudio.py:69-156).

The reference drives the label-studio SDK; this speaks the same REST
surface directly (the SDK is a thin wrapper): project lookup, task
search by ``data.unique_id``, delete-on-overwrite, and batched imports
of 300 tasks per request (the reference's measured safe size,
labelstudio.py:97-101).

Chart assembly (grouping, ordering, enrichment) happens in Spark
(etl/upload_notes.py); conversion to Label Studio payloads is
driver-side over the final chart list — chart review is a
human-annotation workload (--count sampling caps it at hundreds of
charts), so the collect here is bounded by design, like the reference's
in-memory note list.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from cumulus_etl_spark.nlp.http_provider import HttpClient

IMPORT_BATCH_SIZE = 300  # ref labelstudio.py:97-101
SEARCH_BATCH_SIZE = 500  # ref labelstudio.py:110-114


@dataclass
class LabelStudioNote:
    """One Label Studio task's worth of data (ref labelstudio.py:39-66)."""

    unique_id: str
    patient_id: str | None = None
    anon_patient_id: str | None = None
    encounter_id: str | None = None
    anon_encounter_id: str | None = None
    text: str = ""
    date: str | None = None
    doc_mappings: dict = field(default_factory=dict)
    doc_types: dict = field(default_factory=dict)  # note_id → resourceType
    doc_spans: dict = field(default_factory=dict)
    highlights: list = field(default_factory=list)  # (label, begin, end)


def find_highlights(
    text: str, words: list[str] | None, regexes: list[str] | None
) -> list[tuple[str, int, int]]:
    """Whole-word/phrase matches for --highlight-by-word / -regex
    (ref labelstudio.py:243-316 builds the same span predictions)."""
    out: list[tuple[str, int, int]] = []
    patterns: list[tuple[str, re.Pattern]] = []
    for w in words or []:
        for word in w.split(","):
            word = word.strip()
            if word:
                patterns.append((word, re.compile(rf"\b{re.escape(word)}\b", re.IGNORECASE)))
    for rx in regexes or []:
        patterns.append((rx, re.compile(rf"\b(?:{rx})\b", re.IGNORECASE)))
    for label, pat in patterns:
        for m in pat.finditer(text or ""):
            out.append((label, m.start(), m.end()))
    return sorted(out, key=lambda h: (h[1], h[2]))


class LabelStudioClient:
    """REST client: push charts as tasks, honoring --overwrite."""

    def __init__(self, url: str, api_key: str, project_id: int, client: HttpClient | None = None):
        self.base = url.rstrip("/")
        self.project_id = project_id
        self.client = client or HttpClient()
        self.client.headers.setdefault("Authorization", f"Token {api_key}")
        # fail fast if the project doesn't exist (ref __init__ does a get)
        self.project = self.client.get_json(f"{self.base}/api/projects/{project_id}/")

    def _existing_tasks(self, unique_ids: set[str]) -> dict[str, int]:
        """unique_id → task id for charts already on the server."""
        listing = self.client.get_json(f"{self.base}/api/projects/{self.project_id}/tasks/")
        tasks = listing if isinstance(listing, list) else listing.get("tasks", [])
        return {
            t["data"]["unique_id"]: t["id"]
            for t in tasks
            if t.get("data", {}).get("unique_id") in unique_ids
        }

    def _format_task(self, note: LabelStudioNote) -> dict:
        task = {
            "data": {
                "text": note.text,
                "unique_id": note.unique_id,
                "patient_id": note.patient_id,
                "anon_patient_id": note.anon_patient_id,
                "encounter_id": note.encounter_id,
                "anon_encounter_id": note.anon_encounter_id,
                "date": note.date,
                "docref_mappings": note.doc_mappings,
                "docref_spans": {k: list(v) for k, v in note.doc_spans.items()},
            },
            "predictions": [],
        }
        if note.highlights:
            task["predictions"] = [
                {
                    "result": [
                        {
                            "from_name": "label",
                            "to_name": "text",
                            "type": "labels",
                            "value": {
                                "start": begin,
                                "end": end,
                                "text": note.text[begin:end],
                                "labels": [label],
                            },
                        }
                        for label, begin, end in note.highlights
                    ]
                }
            ]
        return task

    def push_tasks(self, notes: list[LabelStudioNote], overwrite: bool = False) -> dict:
        existing = self._existing_tasks({n.unique_id for n in notes})
        overwritten = skipped = 0
        if existing:
            if overwrite:
                for task_id in existing.values():
                    self.client.delete(f"{self.base}/api/tasks/{task_id}/")
                overwritten = len(existing)
            else:
                notes = [n for n in notes if n.unique_id not in existing]
                skipped = len(existing)
        for i in range(0, len(notes), IMPORT_BATCH_SIZE):
            batch = [self._format_task(n) for n in notes[i : i + IMPORT_BATCH_SIZE]]
            self.client.post_json(
                f"{self.base}/api/projects/{self.project_id}/import", batch
            )
        return {"pushed": len(notes), "skipped": skipped, "overwritten": overwritten}
