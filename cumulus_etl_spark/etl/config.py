"""JobConfig: the JSON-serializable job spec (ref cumulus_etl/etl/config.py:74-132).

Persisted under ``<output>/JobConfig/<timestamp>/job_config.json`` so a
run is auditable and re-runnable; summary counters land next to it.
Also enforces the output↔PHI pairing check (etl/config.py:149-171): an
output dir is bound to the codebook id that first wrote it, so you can't
accidentally mix pseudonym namespaces.
"""

from __future__ import annotations

import dataclasses
import json
import os
from datetime import datetime, timezone


@dataclasses.dataclass
class JobConfig:
    input_dir: str
    output_dir: str
    phi_dir: str
    tasks: list[str]
    group_name: str | None = None
    export_datetime: str | None = None
    philter: bool = False
    batch_size: int = 100_000
    timestamp: str = dataclasses.field(
        default_factory=lambda: datetime.now(timezone.utc).strftime("%Y-%m-%dT%H%M%SZ")
    )

    def save(self) -> str:
        out = os.path.join(self.output_dir, "JobConfig", self.timestamp)
        os.makedirs(out, exist_ok=True)
        path = os.path.join(out, "job_config.json")
        with open(path, "w") as fh:
            json.dump(dataclasses.asdict(self), fh, indent=2)
        return path

    def save_summary(self, summary: dict) -> str:
        out = os.path.join(self.output_dir, "JobConfig", self.timestamp)
        os.makedirs(out, exist_ok=True)
        path = os.path.join(out, "job_summary.json")
        with open(path, "w") as fh:
            json.dump(summary, fh, indent=2)
        return path


def check_output_phi_pairing(output_dir: str, codebook_id: str) -> None:
    """Bind an output dir to one codebook; raise on mismatch."""
    os.makedirs(output_dir, exist_ok=True)
    marker = os.path.join(output_dir, ".codebook-id")
    if os.path.exists(marker):
        with open(marker) as fh:
            existing = fh.read().strip()
        if existing != codebook_id:
            raise ValueError(
                f"output dir {output_dir} was built with codebook {existing}, "
                f"but PHI dir provides codebook {codebook_id} — refusing to mix "
                "pseudonym namespaces"
            )
    else:
        with open(marker, "w") as fh:
            fh.write(codebook_id)
