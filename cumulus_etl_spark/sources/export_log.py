"""Bulk-export log parsing (SURVEY §2.1 S5; ref loaders/fhir/export_log.py).

``log.ndjson`` in a bulk-export folder records kickoff and completion
events; the ETL needs the group name, transaction time, and export URL
for completion tracking. A driver-side read — the log is a handful of
lines, not a distributed dataset.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass


@dataclass(frozen=True)
class ExportLogInfo:
    group_name: str | None
    transaction_time: str | None
    export_url: str | None


def parse_export_log(root: str) -> ExportLogInfo | None:
    """Parse ``log.ndjson`` under ``root`` (None if absent/unusable).

    Recognized events: ``kickoff`` (carries the request URL, whose
    ``/Group/<name>/`` segment names the cohort) and ``status_complete``
    (carries ``transactionTime``).
    """
    path = os.path.join(root, "log.ndjson")
    if not os.path.exists(path):
        return None
    group = tx_time = url = None
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if not line:
                continue
            try:
                event = json.loads(line)
            except json.JSONDecodeError:
                continue
            etype = event.get("eventId")
            detail = event.get("eventDetail") or {}
            if etype == "kickoff":
                url = detail.get("exportUrl") or url
                if url and "/Group/" in url:
                    group = url.split("/Group/")[1].split("/")[0]
            elif etype == "status_complete":
                tx_time = detail.get("transactionTime") or tx_time
    if group is None and tx_time is None and url is None:
        return None
    return ExportLogInfo(group_name=group, transaction_time=tx_time, export_url=url)
